package graft.serve

import graft.SparkSpec
import graft.store.Db

/** The reference's PUT-then-GET lifecycle over HTTP
  * (`src/bin/sonnerie-serve.rs`): PUT text-protocol lines commits one
  * transaction and answers 201 `ok`; GET streams the read pipeline as
  * text-protocol lines; exact keys take the point-lookup path.
  */
class ServeSpec extends SparkSpec {

  private def http(method: String, url: String, body: Option[String] = None)
      : (Int, String) = {
    val c = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    body.foreach { b =>
      c.setDoOutput(true)
      c.getOutputStream.write(b.getBytes("UTF-8"))
    }
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    c.disconnect()
    (code, text)
  }

  test("PUT commits one tx (201), GET streams it back (200)") {
    val db = Db(spark, tmpDir("graft-serve"))
    val srv = new Serve(db).start()
    try {
      val base = s"http://localhost:${srv.boundPort}"

      val (putCode, putBody) = http("PUT", s"$base/", Some(
        "fib 10 u 55\nfib 11 u 89\nother 5 u 7\n"))
      assert(putCode == 201 && putBody == "ok")
      assert(db.snapshot().manifest.dataTxids.size == 1,
        "one PUT = one transaction")

      val (gc, gb) = http("GET", s"$base/fib%25") // %25 = urlencoded %
      assert(gc == 200)
      assert(gb == "fib\t10\t55\nfib\t11\t89\n")

      // exact key → point-lookup path; human timestamps
      val (ec, eb) = http("GET", s"$base/other?human")
      assert(ec == 200 && eb == "other\t1970-01-01T00:00:00.000000005\t7\n")

      // a second PUT is a second tx; GET sees the merged view
      val (p2, _) = http("PUT", s"$base/", Some("fib 10 u 56\n"))
      assert(p2 == 201)
      val (_, merged) = http("GET", s"$base/fib%25")
      assert(merged == "fib\t10\t56\nfib\t11\t89\n",
        "last-wins across PUT transactions")

      val (bc, _) = http("POST", s"$base/x", Some("nope"))
      assert(bc == 400)
    } finally srv.stop()
  }

  test("snapshot cache: GETs within the TTL share one snapshot; a commit invalidates it") {
    val db = Db(spark, tmpDir("graft-serve3"))
    val srv = new Serve(db).start() // default TTL 10s >> test duration
    try {
      val base = s"http://localhost:${srv.boundPort}"
      http("PUT", s"$base/", Some("a 1 u 1\n"))
      assert(srv.snapshotLoads == 0, "PUT must not build a read snapshot")

      val (_, first) = http("GET", s"$base/a")
      assert(first == "a\t1\t1\n")
      assert(srv.snapshotLoads == 1)
      val (_, second) = http("GET", s"$base/a")
      assert(second == first)
      assert(srv.snapshotLoads == 1,
        "second GET within the TTL must reuse the cached snapshot")

      // a commit bumps the manifest version → the next GET must see the
      // new data immediately (version probe, no 10s staleness window)
      http("PUT", s"$base/", Some("a 2 u 2\n"))
      val (_, after) = http("GET", s"$base/a")
      assert(after == "a\t1\t1\na\t2\t2\n")
      assert(srv.snapshotLoads == 2,
        "a commit within the TTL must invalidate the cached snapshot")
      http("GET", s"$base/a")
      assert(srv.snapshotLoads == 2, "and the refreshed snapshot is cached again")
    } finally srv.stop()
  }

  test("concurrent PUTs each commit atomically (manifest CAS under load)") {
    val db = Db(spark, tmpDir("graft-serve2"))
    val srv = new Serve(db).start()
    try {
      val base = s"http://localhost:${srv.boundPort}"
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(Future.sequence((1 to 4).map { i =>
        Future(http("PUT", s"$base/", Some(s"k$i 1 u $i\nk$i 2 u ${i * 10}\n")))
      }), 120.seconds)
      assert(results.forall(_._1 == 201), s"results: $results")
      assert(db.snapshot().manifest.dataTxids.size == 4,
        "every concurrent PUT must land as its own transaction")
      val (_, all) = http("GET", s"$base/k%25")
      assert(all.linesIterator.size == 8, s"got:\n$all")
    } finally srv.stop()
  }
}
