package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins `Dedup.canonicalizeUrl` semantics on adversarial inputs, independent of the
 * synthesized corpus the `dedup_url_canonical` gate runs over, plus the property that
 * makes canonicalization usable as a dedup key at all: IDEMPOTENCE. If a canonical form
 * were not a fixed point, re-canonicalizing already-clean URLs (the normal state of a
 * re-crawled lake) would split identical pages across keys.
 */
class UrlCanonSpec extends AnyFunSuite {

  private def canon(urls: String*): Seq[String] = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    urls.toDF("url").select(Dedup.canonicalizeUrl($"url").as("c")).as[String].collect().toSeq
  }

  test("each normalization rule, in isolation") {
    assert(canon("HTTPS://Example.COM/p/1") == Seq("https://example.com/p/1")) // case
    assert(canon("https://example.com:443/p/1") == Seq("https://example.com/p/1")) // default port
    assert(canon("http://example.com:80/p/1") == Seq("http://example.com/p/1"))
    assert(canon("https://example.com:8443/p/1") == Seq("https://example.com:8443/p/1")) // real port survives
    assert(canon("http://example.com:443/p/1") == Seq("http://example.com:443/p/1")) // 443 is NOT http's default
    assert(canon("https://www.example.com/p/1") == Seq("https://example.com/p/1")) // www.
    assert(canon("https://example.com/p/1/") == Seq("https://example.com/p/1")) // trailing slash
    assert(canon("https://example.com/") == Seq("https://example.com/")) // root path is kept
    assert(canon("https://example.com/p/1#frag") == Seq("https://example.com/p/1")) // fragment
    assert(canon("https://example.com/p/1?utm_source=x&utm_medium=y") ==
      Seq("https://example.com/p/1")) // all-tracker query collapses entirely
    assert(canon("https://example.com/p/1?b=2&a=1") ==
      Seq("https://example.com/p/1?a=1&b=2")) // param order
  }

  test("the rules compose on a fully messy URL") {
    assert(canon("HTTPS://WWW.Example.COM:443/p/7/?utm_source=feed&b=2&a=1#sec") ==
      Seq("https://example.com/p/7?a=1&b=2"))
  }

  test("canonicalization is idempotent (canonical forms are fixed points)") {
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/p/7/?utm_source=feed&b=2&a=1#sec",
      "Http://example.com:80/p/1?z=9&a=1",
      "https://example.com:8443/deep/path/?only=1",
      "https://www.example.com/",
      "https://example.com/p/1")
    val once = canon(messy: _*)
    val twice = canon(once: _*)
    assert(twice == once, s"re-canonicalizing moved a fixed point: $once -> $twice")
  }
}
