package graft

import graft.store.{Manifest, ManifestState, TxStats}

/** Dev-only: manifest commit/parse cost as the LIVE transaction set grows
  * (each commit re-serializes dataTxids + txStats). Pure JVM, no Spark.
  */
object ManifestCost {
  def main(args: Array[String]): Unit = {
    for (n <- Seq(100, 1000, 10000, 50000)) {
      val wh = java.nio.file.Files
        .createTempDirectory(s"graft-manifestcost$n").toString
      // seed: one commit installing n live txids with stats
      Manifest.update(wh) { m =>
        m.copy(nextTxid = n.toLong,
          dataTxids = (0L until n.toLong).toVector,
          txStats = (0L until n.toLong).map(t =>
            t -> TxStats(f"key$t%010d", f"key${t + 500}%010d", t, t + 1000)).toMap)
      }
      val bytes = java.nio.file.Files.size(java.nio.file.Paths.get(
        wh, "_manifest", "v000000000001.json"))
      val rounds = 200
      val t0 = System.nanoTime()
      (1 to rounds).foreach(_ =>
        Manifest.update(wh)(m => m.copy(nextTxid = m.nextTxid + 1)))
      val commitMs = (System.nanoTime() - t0) / 1e6 / rounds
      val t1 = System.nanoTime()
      (1 to rounds).foreach(_ => Manifest.current(wh))
      val readMs = (System.nanoTime() - t1) / 1e6 / rounds
      println(f"MCOST live=$n%6d json=${bytes / 1024}%6d KB " +
        f"commit=${commitMs}%8.2f ms read=${readMs}%8.2f ms")
    }
  }
}
