package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize($"url").as("c"))
      .as[String].collect().toSeq

  test("every rule fires: case, default port, fragment, tracking, sort, slash") {
    assert(canon("HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&id=1#top")
      === Seq("http://www.ex.com/a?b=2&id=1"))
    assert(canon("https://ex.com:443/") === Seq("https://ex.com/"))
    // non-default port survives; param order normalizes
    assert(canon("http://ex.com:8080/p?z=1&a=2")
      === Seq("http://ex.com:8080/p?a=2&z=1"))
    // fbclid/gclid dropped, bare root path synthesized
    assert(canon("http://ex.com?gclid=g&fbclid=f") === Seq("http://ex.com/"))
    // https default port only strips on https
    assert(canon("http://ex.com:443/x") === Seq("http://ex.com:443/x"))
    // non-URL input maps to empty string
    assert(canon("not a url") === Seq(""))
  }

  test("canonicalize is idempotent: canonical output re-canonicalizes to itself") {
    val inputs = Seq(
      "HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&id=1#top",
      "https://ex.com:443/",
      "http://ex.com:8080/p?z=1&a=2",
      "http://ex.com?gclid=g&fbclid=f",
      "http://User.EX.com/deep/path/?z=9&y=8&x=7#frag",
      "ftp://Files.Ex.com:21/pub/")
    val once = canon(inputs: _*)
    assert(canon(once: _*) === once)
  }

  test("spelling variants of one page collapse to a single canonical key") {
    val variants = Seq(
      (1L, "HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&id=1#top"),
      (2L, "http://www.ex.com/a?id=1&b=2"),
      (3L, "http://www.ex.com:80/a/?b=2&id=1&utm_campaign=y"),
      (4L, "http://www.ex.com/other"))
    val got = Urls.dedupByCanonical(variants.toDF("id", "url"), "id", "url")
      .orderBy("canonical_url")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("http://www.ex.com/a?b=2&id=1", 1L, 3L, 3L),
      ("http://www.ex.com/other", 4L, 1L, 1L)))
  }
}
