package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: String*): Seq[(String, Long)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.piiScrub(col("text")).as("s"),
        TextAnalysis.piiCount(col("text")).cast("long").as("n"))
      .orderBy("id").as[(Long, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq

  test("emails, phones, IPs, SSNs each redact to their typed token") {
    val r = scrub(
      "mail me at jane.doe+spam@sub.example.co.uk thanks",
      "call (415) 555-2671 or +1 212.555.0199 today",
      "server at 192.168.1.254 timed out",
      "ssn 078-05-1120 on file",
      "clean text with no pii at all")
    assert(r(0) == ("mail me at <EMAIL> thanks", 1L))
    assert(r(1) == ("call <PHONE> or <PHONE> today", 2L))
    assert(r(2) == ("server at <IP> timed out", 1L))
    assert(r(3) == ("ssn <SSN> on file", 1L))
    assert(r(4) == ("clean text with no pii at all", 0L))
  }

  test("pattern-order hazards: IP is not eaten as phone, email digits stay whole") {
    val r = scrub(
      "email a1@b2.com and ip 10.0.0.1",
      "mixed 555-123-4567 next to 078-05-1120")
    assert(r(0) == ("email <EMAIL> and ip <IP>", 2L))
    // phone (3-3-4) and SSN (3-2-4) shapes must not cross-match
    assert(r(1) == ("mixed <PHONE> next to <SSN>", 2L))
  }

  test("scrub is idempotent") {
    val once = scrub("reach user@host.org at 10.1.2.3")(0)._1
    assert(scrub(once)(0) == (once, 0L))
  }
}
