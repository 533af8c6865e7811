package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LocaleNumericSpec extends SparkSpec {
  import spark.implicits._

  private def parse(ss: Seq[String]): Seq[Option[BigDecimal]] =
    ss.toDF("s").select(LocaleNumeric.parseLocaleNumeric($"s").cast("decimal(38,9)"))
      .collect().map(r => Option(r.getDecimal(0)).map(BigDecimal(_))).toSeq

  test("reference branch cases (stg_order.sql:37-61)") {
    val cases = Seq(
      "1.234,56"  -> Some(BigDecimal("1234.56")),   // dot-first: thousands dots
      "1,234.56"  -> Some(BigDecimal("1234.56")),   // comma-first: thousands commas
      "1234,56"   -> Some(BigDecimal("1234.56")),   // comma-only = decimal
      "1234.56"   -> Some(BigDecimal("1234.56")),
      "1٫5"       -> Some(BigDecimal("1.5")),       // arabic decimal sep
      " 1 234.56 " -> Some(BigDecimal("1234.56")),  // spaces stripped
      "12.345.678,99" -> Some(BigDecimal("12345678.99")),
      "abc"       -> None,
      ""          -> None)
    val got = parse(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g.map(_.setScale(2)) === want.map(_.setScale(2)), s"input: '$in'")
    }
  }

  test("property: every locale formatting of x parses back to x (seeded)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(300) {
      BigDecimal(s"${rnd.nextLong(100000000L).abs}.${"%02d".format(rnd.nextInt(100))}")
    }
    val variants = samples.flatMap { x =>
      val us = x.setScale(2).toString
      Seq(x -> us, x -> us.replace('.', ','), x -> us.replace(".", "٫"), x -> s" $us ")
    }
    val got = parse(variants.map(_._2))
    variants.zip(got).foreach { case ((x, in), g) =>
      assert(g.map(_.setScale(2)) === Some(x.setScale(2)), s"x=$x input='$in'")
    }
  }
}
