package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DocTextOps

/** Pins the PII scrub (DocTextOps.piiRedact): per-category counts, the exact
  * redacted output (via md5 against a hand-built expectation), and that the
  * phone pattern cannot fire inside an already-redacted email/IP. */
class PiiRedactSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("counts and exact redaction on spiced text") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world"),
      (2L, "mail me at a.b@c.io or ring 212.555.0199 from 8.8.8.8"),
      (15L, "plain") // 15 % 3 = 0 AND 15 % 5 = 0: both extra fragments fire
    ).toDF("doc_id", "text")
    val rows = DocTextOps.piiRedact(df).collect()

    val spiceRed = " contact <EMAIL> or <EMAIL>, call <PHONE> ext 9, host <IP> end"

    // doc 1 is PII-free: all hits come from the spice suffix
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) === ((2L, 1L, 1L)))
    val exp1 = "hello world" + spiceRed
    assert(r1.getAs[Long]("redacted_len") === exp1.length.toLong)
    assert(r1.getAs[String]("redacted_md5") === md5hex(exp1))

    // doc 2 carries its own email, dotted phone, and IP
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) === ((3L, 2L, 2L)))
    val exp2 = "mail me at <EMAIL> or ring <PHONE> from <IP>" + spiceRed
    assert(r2.getAs[String]("redacted_md5") === md5hex(exp2))

    // the count-varying extras (the de-vacuized sweep finding): base spice
    // + one extra email/IP (%3) + one extra phone (%5)
    val r15 = rows.find(_.getLong(0) == 15L).get
    assert((r15.getLong(1), r15.getLong(2), r15.getLong(3)) === ((3L, 2L, 2L)))
    val exp15 = "plain" + spiceRed + " cc <EMAIL> node <IP>" + " fax <PHONE> now"
    assert(r15.getAs[String]("redacted_md5") === md5hex(exp15))
  }
}
