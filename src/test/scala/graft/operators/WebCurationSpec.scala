package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebCurationSpec extends SparkSpec {

  private def urls = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 90L, "https://www.alpha-mirror.org/en/doc/1?p=1"),
      (2L, 50L, "https://cdn.alpha-mirror.org/fr/doc/2?p=2"),
      (3L, 70L, "https://www.beta.net/path/deep/3?p=3"),
      (4L, 70L, "https://www.beta.net/other?p=4"))
      .toDF("doc_id", "n_chars", "url")
  }

  test("parseUrls: host/path/query split; registered domain collapses subdomains") {
    val out = WebCuration.parseUrls(urls)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("host"), r.getAs[String]("path"),
          r.getAs[String]("query"), r.getAs[String]("domain")))).toMap
    assert(out(1L) == (("www.alpha-mirror.org", "/en/doc/1", "p=1", "alpha-mirror.org")))
    // different subdomain, SAME registered domain — that's the cap unit
    assert(out(2L)._4 == "alpha-mirror.org")
    assert(out(3L) == (("www.beta.net", "/path/deep/3", "p=3", "beta.net")))
  }

  test("domainCap: quota per registered domain, best n_chars first, doc_id tiebreak") {
    val capped = WebCuration.domainCap(WebCuration.parseUrls(urls), k = 1, orderCol = "n_chars")
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("domain_rank")))
    assert(capped.length == 2)
    val byDomain = capped.map(t => t._1 -> t._2).toMap
    assert(byDomain("alpha-mirror.org") == 1L) // 90 chars beats 50
    assert(byDomain("beta.net") == 3L)         // 70 == 70: lower doc_id wins
    assert(capped.forall(_._3 == 1L))
  }
}
