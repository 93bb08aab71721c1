package graft.ops

import graft.SparkSpecBase

class PiiScrubSpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, "reach me at jane.doe+spam@mail.example.org or 10.0.42.7 today"),
    (2L, "two mails: a@b.io c_d%x@sub.domain.co and tel 25-989-741-2988"),
    (3L, "no pii here, just text with an @ sign and 1.2 version dots"),
    (4L, "ips 192.168.0.1 8.8.8.8 and a phone 123-456-7890 that is NOT dashed enough"))

  test("scrub counts and redacts each category") {
    val got = PiiScrub.scrub(rows.toDF("id", "text"), "id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, String)].collect()

    assert(got(0) == ((1L, 1L, 1L, 0L,
      "reach me at <EMAIL> or <IP> today")))
    assert(got(1) == ((2L, 2L, 0L, 1L,
      "two mails: <EMAIL> <EMAIL> and tel <PHONE>")))
    assert(got(2) == ((3L, 0L, 0L, 0L,
      "no pii here, just text with an @ sign and 1.2 version dots")))
    // 123-456-7890 is 3-3-4, not the 2/3-3-3/4-4 shape -> not a phone match
    assert(got(3) == ((4L, 0L, 2L, 0L,
      "ips <IP> <IP> and a phone 123-456-7890 that is NOT dashed enough")))
  }

  test("null text yields null redaction and zero counts stay typed") {
    val df = Seq((1L, "x@y.ab"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val got = PiiScrub.scrub(df, "id", "text").orderBy("id").collect()
    assert(got(0).getString(4) == "<EMAIL>")
    assert(got(1).isNullAt(4) && got(1).isNullAt(1))
  }
}
