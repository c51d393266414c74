package graft

import scala.collection.mutable.ArrayBuffer

/** CLI verb parity — the README quick-start flow (`README.md:64-96`)
  * driven through the argument surface.
  */
class CliSpec extends SparkSpec {

  private def cli(args: String*)(stdin: String*): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    Cli.run(spark, args.toList, stdin.iterator, out += _)
    out.toSeq
  }

  test("add / read / delete / compact quick-start flow") {
    val wh = tmpDir("graft-cli")
    cli("-d", wh, "add", "--format", "u")(
      "fibonacci 2020-01-01T00:00:00 1",
      "fibonacci 2020-01-02T00:00:00 1",
      "fibonacci 2020-01-03T00:00:00 2")
    cli("-d", wh, "add", "--format", "u")(
      "fibonacci 2020-01-04T00:00:00 3")

    val read = cli("-d", wh, "read", "fib%", "--human")()
    assert(read == Seq(
      "fibonacci\t2020-01-01T00:00:00\t1",
      "fibonacci\t2020-01-02T00:00:00\t1",
      "fibonacci\t2020-01-03T00:00:00\t2",
      "fibonacci\t2020-01-04T00:00:00\t3"))

    val timed = cli("-d", wh, "read", "%", "--human",
      "--after-time", "2020-01-02", "--before-time", "2020-01-04")()
    assert(timed.size == 2)

    cli("-d", wh, "delete", "--wildcard", "fib%", "--time", "2020-01-01T00:00:00")()
    assert(cli("-d", wh, "read", "%")().size == 3)

    cli("-d", wh, "compact", "--major")()
    assert(cli("-d", wh, "read", "%", "--human")().head ==
      "fibonacci\t2020-01-02T00:00:00\t1")

    // deep-history maintenance from the CLI: keep the newest 2 versions;
    // reads and the warehouse identity are unaffected
    val id0 = graft.store.Manifest.identity(wh)
    cli("-d", wh, "compact", "--prune-history", "2")()
    assert(graft.store.Manifest.versions(wh).size == 2)
    assert(graft.store.Manifest.identity(wh) == id0)
    assert(cli("-d", wh, "read", "%")().size == 3)
  }

  test("tail verb: change feed with a resumable cursor") {
    val wh = tmpDir("graft-cli-tail")
    cli("-d", wh, "add", "--format", "u")("a 100 1")
    val first = cli("-d", wh, "tail")()
    assert(first.exists(_.startsWith("a\t")) && first.last.startsWith("# cursor "))
    val cursor = first.last.stripPrefix("# cursor ")
    cli("-d", wh, "add", "--format", "u")("b 200 2")
    val next = cli("-d", wh, "tail", "%", "--since-txid", cursor)()
    assert(next.count(!_.startsWith("#")) == 1 && next.head.startsWith("b\t"))
  }

  test("multicolumn --columns selection and per-line formats") {
    val wh = tmpDir("graft-cli2")
    cli("-d", wh, "add")(
      "a 1 uuu 10 20 30",
      "b 2 ss Hello\\ x World")
    val sel = cli("-d", wh, "read", "a", "--columns", "1,3")()
    assert(sel == Seq("a\t1\t10 30"))
    val full = cli("-d", wh, "read", "%", "--with-format")()
    assert(full == Seq("a\t1\tuuu\t10 20 30", "b\t2\tss\tHello\\ x World"))
  }

  test("add --timestamp-format parses a custom input layout") {
    val wh = tmpDir("graft-cli5")
    cli("-d", wh, "add", "--format", "u",
      "--timestamp-format", "dd/MM/yyyy HH:mm")("k 01/02/2020\\ 03:04 9")
    assert(cli("-d", wh, "read", "k", "--human")() ==
      Seq("k\t2020-02-01T03:04:00\t9"))
  }

  test("chrono strftime layouts work verbatim (reference main.rs:520-543)") {
    // a sonnerie user's `--timestamp-format '%FT%T'` must work unchanged
    val wh = tmpDir("graft-cli6")
    cli("-d", wh, "add", "--format", "u",
      "--timestamp-format", "%FT%T")("k 2020-01-01T00:00:01 7")
    cli("-d", wh, "add", "--format", "u",
      "--timestamp-format", "%Y-%m-%d %H:%M:%S%.f")("k 2020-01-01\\ 00:00:02.5 8")
    assert(cli("-d", wh, "read", "k")() == Seq(
      "k\t1577836801000000000\t7",
      "k\t1577836802500000000\t8"))
    // strftime on the output side too
    assert(cli("-d", wh, "read", "k", "--timestamp-format", "%F %T")() ==
      Seq("k\t2020-01-01 00:00:01\t7", "k\t2020-01-01 00:00:02\t8"))
    // the exotic chrono tokens round-trip through the CLI: month-name
    // ingest layout in, same layout out (formatted.rs:39-47)
    cli("-d", wh, "add", "--format", "u",
      "--timestamp-format", "%d %b %Y %H:%M:%S")("k 02\\ Jan\\ 2020\\ 00:00:03 9")
    assert(cli("-d", wh, "read", "k", "--timestamp-format",
      "%d %b %Y %H:%M:%S")() == Seq(
      "k\t01 Jan 2020 00:00:01\t7",
      "k\t01 Jan 2020 00:00:02\t8",
      "k\t02 Jan 2020 00:00:03\t9"))
  }

  test("dump prints one transaction's records (examples/get.rs:5-46)") {
    val wh = tmpDir("graft-cli-dump")
    cli("-d", wh, "add", "--format", "u")("a 1 10")
    cli("-d", wh, "add", "--format", "u")("a 1 11", "b 2 20")
    val txids = graft.store.Db(spark, wh).snapshot().manifest.dataTxids
    assert(cli("-d", wh, "dump", txids.head.toString)() == Seq("a\t1\t10"))
    assert(cli("-d", wh, "dump", txids.last.toString)() ==
      Seq("a\t1\t11", "b\t2\t20"))
    // dump is raw per-tx content: no last-wins, no delete filtering
    intercept[Exception](cli("-d", wh, "dump", "999")())
  }

  test("reference flag spellings: key-range read, ts modes, print-format") {
    val wh = tmpDir("graft-cli-ref")
    cli("-d", wh, "add", "--format", "u")("alpha 1 1", "beta 2 2", "gamma 3 3")
    // key-range read without a pattern (after inclusive, before exclusive)
    assert(cli("-d", wh, "read", "--after-key", "alpha",
      "--before-key", "gamma")() == Seq("alpha\t1\t1", "beta\t2\t2"))
    assert(cli("-d", wh, "read", "--after-key", "b")() ==
      Seq("beta\t2\t2", "gamma\t3\t3"))
    // reference boolean spellings
    assert(cli("-d", wh, "read", "beta", "--timestamp-seconds")() ==
      Seq("beta\t0\t2"))
    assert(cli("-d", wh, "read", "beta", "--timestamp-nanos")() ==
      Seq("beta\t2\t2"))
    assert(cli("-d", wh, "read", "beta", "--print-format")() ==
      Seq("beta\t2\tu\t2"))
    // delete with reference key-bound spellings
    cli("-d", wh, "delete", "--after-key", "beta", "--before-key", "gamma")()
    assert(cli("-d", wh, "read", "%")().map(_.split('\t').head) ==
      Seq("alpha", "gamma"))
    // pattern + key bounds conflict (reference conflicts_with): hard
    // error, never a silent unbounded read
    intercept[Exception](
      cli("-d", wh, "read", "%", "--after-key", "alpha")())
  }

  test("every documented serve/compact flag parses as a value flag") {
    // --ann-dir was documented for the serve verb but missing from
    // valueFlags, so `serve --ann-dir /x` died with "unknown verb" —
    // pin the whole documented flag surface against that regression
    val (flags, pos) = Cli.parseArgs(List("serve", "--port", "7070",
      "--ann-dir", "/tmp/ann", "--stale-ms", "2000"))
    assert(pos == List("serve"), s"flags leaked into positionals: $pos")
    assert(flags == Map("--port" -> "7070", "--ann-dir" -> "/tmp/ann",
      "--stale-ms" -> "2000"))
    val (f2, p2) = Cli.parseArgs(List("compact", "--prune-history", "5"))
    assert(p2 == List("compact") && f2 == Map("--prune-history" -> "5"))
  }

  test("parseColumns handles ranges") {
    assert(Cli.parseColumns("1,3,5-7") == Seq(1, 3, 5, 6, 7))
  }

  test("read --parallel pipes partitions through a subprocess (main.rs:234-279)") {
    val wh = tmpDir("graft-cli4")
    cli("-d", wh, "add", "--format", "u")(
      "a 1 10", "b 2 20", "c 3 30")
    val out = cli("-d", wh, "read", "%", "--parallel", "wc -l")()
    // one count line per partition; totals must cover all 3 records
    assert(out.map(_.trim.toInt).sum == 3)
  }

  test("timestamp output modes: nanos, seconds, strftime pattern") {
    val wh = tmpDir("graft-cli3")
    cli("-d", wh, "add", "--format", "u")("k 2020-01-01T00:00:01 7")
    assert(cli("-d", wh, "read", "k")() == Seq("k\t1577836801000000000\t7"))
    assert(cli("-d", wh, "read", "k", "--timestamp-format", "seconds")() ==
      Seq("k\t1577836801\t7"))
    assert(cli("-d", wh, "read", "k", "--timestamp-format", "yyyy/MM/dd HH:mm:ss")() ==
      Seq("k\t2020/01/01 00:00:01\t7"))
  }

  test("read --at-version time-travels to an older committed snapshot") {
    val wh = tmpDir("graft-cli-tt")
    cli("-d", wh, "add", "--format", "u")("k 1 10")
    val v1 = graft.store.Manifest.currentVersion(wh) // first publish
    cli("-d", wh, "add", "--format", "u")("k 1 99", "k2 2 20")
    // current view: last-wins merge of both transactions
    assert(cli("-d", wh, "read", "%")() ==
      Seq("k\t1\t99", "k2\t2\t20"))
    // at the first published version the overwrite never happened
    assert(cli("-d", wh, "read", "%", "--at-version", v1.toString)() ==
      Seq("k\t1\t10"))
  }

  test("stats verb reports the sketch stores; empty warehouse is quiet") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val wh = tmpDir("graft-cli-stats")
    val db = graft.store.Db(spark, wh)
    // an empty warehouse answers the zero report, never an error
    assert(cli("-d", wh, "stats")() == Seq("distinct\t0\texact"))
    val toks = (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"c$i")).toDF("t")
    graft.ops.SketchStore.registerKmv(db, toks, col("t"))
    graft.ops.SketchStore.registerMg(db, toks, col("t"), batchId = 0L)
    graft.ops.SketchStore.registerHist(db,
      (1 to 80).map(_.toLong).toDF("v"), col("v"), batchId = 0L)
    val out = cli("-d", wh, "stats", "--heavy", "2")()
    assert(out.head == "distinct\t31\texact", out.toString)
    assert(out.contains("quantile\tp500\t[40,48)\tn=80"), out.toString)
    assert(out.contains("heavy\thot\t50\tcertain"), out.toString)
  }

  test("fold / migrate-grid / stats --by maintenance verbs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val wh = tmpDir("graft-cli-fold")
    val db = graft.store.Db(spark, wh)
    val toks = (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"c$i")).toDF("t")
    graft.ops.SketchStore.registerKmv(db, toks, col("t"))
    graft.ops.SketchStore.registerMg(db, toks, col("t"), batchId = 0L)
    graft.ops.SketchStore.registerHist(db,
      (1 to 80).map(_.toLong).toDF("v"), col("v"), batchId = 0L)
    graft.ops.SketchStore.registerHistBy(db,
      (1 to 80).map(i => (s"s${i % 2}", i.toLong)).toDF("g", "v"),
      col("g"), col("v"), batchId = 0L)
    graft.ops.SketchStore.registerKmvBy(db,
      (1 to 40).map(i => (s"s${i % 2}", s"w${i % 9}")).toDF("g", "t"),
      col("g"), col("t"))
    graft.ops.SketchStore.registerMgBy(db,
      (Seq.fill(30)(("s0", "hot0")) ++ Seq.fill(20)(("s1", "hot1")) ++
        (1 to 10).map(i => ("s1", s"c$i"))).toDF("g", "t"),
      col("g"), col("t"), batchId = 0L)
    // fold everything: registered stores report their fold tx, the
    // never-registered count-min store reports empty — and the stats
    // report is unchanged by the maintenance
    val before = cli("-d", wh, "stats", "--heavy", "2")()
    val folded = cli("-d", wh, "fold")()
    assert(folded.exists(_.startsWith("fold\tkmv\ttx=")), folded.toString)
    assert(folded.contains("fold\tcm\tempty"), folded.toString)
    assert(folded.exists(_.startsWith("fold\tmg\ttx=")), folded.toString)
    assert(folded.exists(_.startsWith("fold\thist\ttx=")), folded.toString)
    assert(folded.exists(_.startsWith("fold\thistby\ttx=")), folded.toString)
    assert(folded.exists(_.startsWith("fold\tkmvby\ttx=")), folded.toString)
    assert(folded.exists(_.startsWith("fold\tmgby\ttx=")), folded.toString)
    assert(cli("-d", wh, "stats", "--heavy", "2")() == before,
      "fold changed the stats report")
    // grouped envelopes off the grouped store
    val by = cli("-d", wh, "stats", "--by")()
    assert(by.exists(_.startsWith("quantile\ts0\tp500\t")), by.toString)
    assert(by.exists(_.startsWith("quantile\ts1\tp990\t")), by.toString)
    // grouped distinct estimates and frequent items off their stores
    val byKmv = cli("-d", wh, "stats", "--by", "--kind", "kmv")()
    assert(byKmv == Seq("distinct\ts0\t9\texact", "distinct\ts1\t9\texact"),
      byKmv.toString)
    val byMg = cli("-d", wh, "stats", "--by", "--kind", "mg", "--heavy", "1")()
    assert(byMg == Seq("heavy\ts0\thot0\t30\tcertain",
      "heavy\ts1\thot1\t20\tcertain"), byMg.toString)
    // grouped count-min point probes: any item, per source
    graft.ops.SketchStore.registerCountMinBy(db,
      (Seq.fill(7)(("s0", "x")) ++ Seq.fill(3)(("s1", "x")))
        .toDF("g", "t"),
      col("g"), col("t"), batchId = 0L)
    val byCm = cli("-d", wh, "stats", "--by", "--kind", "cm",
      "--items", "x,zzz")()
    assert(byCm == Seq("freq\ts0\tx\t7", "freq\ts0\tzzz\t0",
      "freq\ts1\tx\t3", "freq\ts1\tzzz\t0"), byCm.toString)
    val byCmOne = cli("-d", wh, "stats", "--by", "--kind", "cm",
      "--items", "x", "--grp", "s1")()
    assert(byCmOne == Seq("freq\ts1\tx\t3"), byCmOne.toString)
    // grid migration rewrites the envelopes at the coarser width — the
    // grouped store migrates independently of the ungrouped one
    val mig = cli("-d", wh, "migrate-grid", "--width", "16")()
    assert(mig.exists(_.startsWith("migrate\ttx=")), mig.toString)
    val after = cli("-d", wh, "stats")()
    assert(after.contains("quantile\tp500\t[32,48)\tn=80"), after.toString)
    val migBy = cli("-d", wh, "migrate-grid", "--by", "--width", "16")()
    assert(migBy.exists(_.startsWith("migrate\ttx=")), migBy.toString)
    val afterBy = cli("-d", wh, "stats", "--by")()
    assert(afterBy.exists(_.startsWith("quantile\ts0\tp500\t[")),
      afterBy.toString)
  }

  test("stats --kind ann: the CLI twin of /_query/stats?kind=ann — " +
      "occupancy plus the retrain/refine decision") {
    import spark.implicits._
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val emb = Seq(
      (0L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
      (1L, vec(0, 1, 0, 0, 0, 0, 1, 0)),
      (2L, vec(0.9, 0.1, 0, 0, 0, 0, 0.1, 0.9)),
      (3L, vec(0.1, 0.9, 0, 0, 0, 0, 0.9, 0.1)),
      (4L, vec(0.8, 0, 0.1, 0, 0, 0.1, 0, 0.8))
    ).toDF("vec_id", "embedding")
    val wh = tmpDir("graft-cli-annstats")
    graft.ops.Similarity.buildIndex(graft.store.Db(spark, wh), emb,
      "vec_id", "embedding", nCells = 2, m = 2, k = 4, dim = 8)
    val out = cli("-d", wh, "stats", "--kind", "ann")()
    assert(out == Seq(
      "cells\t2", "codes\t5", "occ\tmin=2\tp50=3\tp95=3\tmax=3",
      "dead\t0", "skew\t1.0000", "advice\trefine"), out.toString)
    // an empty warehouse answers quietly, like the serving verb's
    // zero-row body
    val none = cli("-d", tmpDir("graft-cli-annstats-empty"),
      "stats", "--kind", "ann")()
    assert(none == Seq("cells\t0"), none.toString)
  }
}
