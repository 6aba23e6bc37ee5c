package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.GraftSpecBase

/** Property tests for the canonicalization/fingerprint operators: the
  * invariants an independent implementation must also satisfy, checked
  * over generated inputs (all evaluated through the real Spark column
  * expressions, batched per property run for speed).
  */
class CanonPropertySpec extends GraftSpecBase {
  import spark.implicits._

  private def canonAll(urls: Seq[String]): Seq[String] =
    urls.toDF("url").select(TextAnalysis.canonicalizeUrl(col("url"))).as[String].collect().toSeq

  private val hostGen = for {
    www  <- Gen.oneOf("", "www.", "WWW.")
    name <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)
    tld  <- Gen.oneOf("com", "org", "io")
    up   <- Gen.oneOf(true, false)
  } yield { val h = s"$www$name.$tld"; if (up) h.toUpperCase else h }

  private val paramGen = Gen.oneOf(
    "utm_source=x", "utm_campaign=year", "ref=feed", "id=7", "page=2", "q=spark"
  )

  private val urlGen = for {
    scheme <- Gen.oneOf("http", "https")
    host   <- hostGen
    path   <- Gen.listOf(Gen.alphaNumStr.map(_.take(6))).map(_.take(3).filter(_.nonEmpty))
    params <- Gen.listOf(paramGen).map(_.take(4).distinct)
    frag   <- Gen.oneOf("", "#top", "#sec-2")
  } yield {
    val p = if (path.isEmpty) "" else path.mkString("/", "/", "")
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$scheme://$host$p$q$frag"
  }

  private def check(prop: org.scalacheck.Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("canonicalizeUrl is idempotent") {
    check(forAll(Gen.listOfN(20, urlGen)) { urls =>
      val once = canonAll(urls)
      canonAll(once) == once
    })
  }

  test("canonical URLs carry no fragment, no tracking params, lowercase host") {
    check(forAll(Gen.listOfN(20, urlGen)) { urls =>
      canonAll(urls).forall { c =>
        !c.contains("#") && !c.contains("utm_") && !c.contains("ref=") &&
        !c.contains("://www.") && {
          val host = c.replaceFirst("^https?://", "").takeWhile(_ != '/').takeWhile(_ != '?')
          host == host.toLowerCase
        }
      }
    })
  }

  test("pHash: equal payloads hash equal; hamming is symmetric and within [0,16]") {
    val payloadGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(400).mkString)
    check(forAll(Gen.listOfN(10, payloadGen)) { ps =>
      val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
        .select($"id", Multimodal.pHashHex($"payload").as("ph"))
      val pairs = df.as("x").join(df.as("y"), $"x.id" <= $"y.id")
        .select($"x.ph", $"y.ph",
          Multimodal.pHashHamming($"x.ph", $"y.ph").as("d_xy"),
          Multimodal.pHashHamming($"y.ph", $"x.ph").as("d_yx"))
        .as[(String, String, Long, Long)].collect()
      pairs.forall { case (a, b, dxy, dyx) =>
        dxy == dyx && dxy >= 0 && dxy <= 16 && (a != b || dxy == 0) && (dxy != 0 || a == b)
      }
    })
  }
}
