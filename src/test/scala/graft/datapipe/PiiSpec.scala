package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Pii]] — the engine-portable PII detect/redact battery. */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def redact(texts: (Long, String)*) = {
    import spark.implicits._
    Pii.redact(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("each pattern detects and redacts its kind") {
    val r = redact(
      1L -> "write to john.doe+x@sub.example.org today",
      2L -> "server at 192.168.0.1 answered",
      3L -> "call +14155551234 now",
      4L -> "ssn is 123-45-6789 ok")
    assert(r(1L).getAs[Long]("n_email") == 1L)
    assert(r(1L).getAs[String]("clean_text") == "write to <EMAIL> today")
    assert(r(2L).getAs[Long]("n_ipv4") == 1L)
    assert(r(2L).getAs[String]("clean_text") == "server at <IP> answered")
    assert(r(3L).getAs[Long]("n_phone") == 1L)
    assert(r(3L).getAs[String]("clean_text") == "call <PHONE> now")
    assert(r(4L).getAs[Long]("n_ssn") == 1L)
    assert(r(4L).getAs[String]("clean_text") == "ssn is <SSN> ok")
    assert(r.values.forall(_.getAs[Long]("n_pii") == 1L))
  }

  test("sequential order: the email match consumes its dotted host first") {
    // "1.2.so" is both inside the email AND an ipv4-prefix-shaped run;
    // email redacts first, so no mangled hybrid remains
    val r = redact(1L -> "admin@1.2.so pinged 10.0.0.2")(1L)
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_ipv4") == 1L)
    assert(r.getAs[String]("clean_text") == "<EMAIL> pinged <IP>")
    // an IP-hosted address is NOT an email (alpha TLD required): both
    // bare IPs redact as IPs, the user part survives
    val s = redact(2L -> "admin@10.0.0.1 pinged 10.0.0.2")(2L)
    assert(s.getAs[Long]("n_email") == 0L)
    assert(s.getAs[Long]("n_ipv4") == 2L)
    assert(s.getAs[String]("clean_text") == "admin@<IP> pinged <IP>")
  }

  test("multiple occurrences all redact; clean text has none left") {
    val r = redact(1L -> "a@b.co and c@d.org or 1.2.3.4 via +12345678")(1L)
    assert(r.getAs[Long]("n_pii") == 4L)
    val clean = r.getAs[String]("clean_text")
    assert(clean == "<EMAIL> and <EMAIL> or <IP> via <PHONE>")
    val again = redact(99L -> clean)(99L)
    assert(again.getAs[Long]("n_pii") == 0L)
  }

  test("clean, empty, and null text pass through with zero counts") {
    val r = redact(1L -> "no secrets here, just words.",
      2L -> "", 3L -> null.asInstanceOf[String])
    assert(r.values.forall(_.getAs[Long]("n_pii") == 0L))
    assert(r(1L).getAs[String]("clean_text") == "no secrets here, just words.")
    assert(r(3L).getAs[String]("clean_text") == "")
  }

  test("word boundaries: digit runs inside longer tokens do not match") {
    val r = redact(1L -> "version 1.2.3.4567 and id 123-45-67890")(1L)
    // 4th octet ends mid-token (\\b fails inside the digit run), and
    // the ssn shape is followed by an extra digit
    assert(r.getAs[Long]("n_ipv4") == 0L)
    assert(r.getAs[Long]("n_ssn") == 0L)
  }
}
