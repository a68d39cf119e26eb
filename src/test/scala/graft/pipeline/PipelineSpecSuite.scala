package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.time.Instant

class PipelineSpecSuite extends SparkSpec {

  test("ReportWriter: date-partitioned single CSV, lossless roundtrip, expiring URL") {
    val fixed = Instant.parse("2026-03-05T10:00:00Z")
    val writer = new ReportWriter(tmpDir("graft-report-"), clock = () => fixed)
    val df = graft.sources.TableLoader.table(spark, sfDir, "orders").limit(100)
    val handle = writer.write(df, expiresInSeconds = 3600)

    assert(handle.path.contains("reports/year=2026/month=3/day=5/"))
    assert(handle.path.endsWith(".csv"))
    assert(handle.url == s"file://${handle.path}")
    assert(handle.expiresAt == fixed.plusSeconds(3600))

    val back = spark.read.schema(df.schema).option("header", "true").csv(handle.path)
    assert(back.count() == 100)
    assert(df.exceptAll(back).isEmpty)
  }

  test("ReportWriter: digest manifest verifies the delivered file and catches tampering") {
    val s = spark
    import s.implicits._
    val writer = new ReportWriter(tmpDir("graft-report-digest-"))
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
    val handle = writer.write(df, format = "parquet", digestManifest = true)
    val back = spark.read.parquet(handle.path)
    assert(writer.verifyDigest(back, handle.path), "delivered file must verify")
    // shuffled column/row order still verifies (order-independent digest)
    assert(writer.verifyDigest(back.orderBy(col("name").desc).repartition(3), handle.path))
    // a tampered row must fail
    val tampered = back.withColumn("name",
      when(col("id") === 2L, lit("BETA")).otherwise(col("name")))
    assert(!writer.verifyDigest(tampered, handle.path), "tampering must break the digest")
    assert(!writer.verifyDigest(back.limit(2), handle.path), "missing rows must break the count")
  }

  test("ReportWriter: JSON-lines format shares the layout and stays lossless") {
    val fixed = Instant.parse("2026-03-05T10:00:00Z")
    val writer = new ReportWriter(tmpDir("graft-report-json-"), clock = () => fixed)
    val df = graft.sources.TableLoader.table(spark, sfDir, "orders").limit(100)
    val handle = writer.write(df, format = "json")
    assert(handle.path.contains("reports/year=2026/month=3/day=5/"))
    assert(handle.path.endsWith(".json"))
    val back = spark.read.schema(df.schema).json(handle.path)
    assert(back.count() == 100)
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)
    intercept[IllegalArgumentException] { writer.write(df, format = "xml") }
  }

  test("email template renders the reference card with the download link") {
    val html = DownloadReportEmailTemplate("file:///tmp/r.csv").render()
    assert(html.contains("""<a href="file:///tmp/r.csv""""))
    assert(html.contains("Download Report"))
    assert(html.contains("Thank you for using our service"))
  }

  test("ReportPipeline.run: FULL + INC sources -> SQL -> CSV -> email + topic") {
    val sender = new LoggingEmailSender
    val notifier = new LoggingNotifier
    val pipeline = new ReportPipeline(spark, tmpDir("graft-pipe-ckpt-"), sender, notifier)
    val spec = PipelineSpec(
      sources = Seq(
        SourceSpec("orders", s"$sfDir/orders.parquet"),
        SourceSpec("customer", s"$sfDir/customer.parquet"),
        SourceSpec("events", s"$sfDir/events.parquet", mode = LoadMode.Incremental, commitColumn = "ts")),
      transform = TransformSpec(
        """SELECT o.o_orderkey, c.c_name
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin),
      report = Some(ReportSpec("from@x", "to@x", "Your report", tmpDir("graft-pipe-report-"),
        notifyTopic = Some("graft-reports"))))

    val (result, handle) = pipeline.run(spec)
    assert(result.count() > 0)
    assert(handle.nonEmpty)
    assert(sender.sent.map(_.subject) == Seq("Your report"))
    assert(sender.sent.head.htmlBody.contains(handle.get.url))
    assert(notifier.published.map(_.topic) == Seq("graft-reports"))
    assert(notifier.published.head.message.contains(handle.get.url))
    // INC source registered too: second load yields an empty increment view
    pipeline.loadSources(spec)
    assert(spark.table("events").count() == 0)
  }

  test("quality gate: failing expectation aborts before report/email/watermark") {
    import graft.operators.QualityChecks._
    val sender = new LoggingEmailSender
    val ckpt = tmpDir("graft-pipe-gate-")
    def spec(maxPrice: Double) = PipelineSpec(
      sources = Seq(
        SourceSpec("orders", s"$sfDir/orders.parquet"),
        SourceSpec("events", s"$sfDir/events.parquet", mode = LoadMode.Incremental, commitColumn = "ts")),
      transform = TransformSpec("SELECT o_orderkey, o_totalprice FROM orders"),
      report = Some(ReportSpec("f@x", "t@x", "r", tmpDir("graft-pipe-gate-rep-"))),
      qualityGate = Some(result => Seq(
        notNull(result, "o_orderkey", "key_not_null"),
        inRange(result, "o_totalprice", 0.0, maxPrice, "price_range"))))

    val pipeline = new ReportPipeline(spark, ckpt, sender)
    val e = intercept[QualityGateFailed](pipeline.run(spec(maxPrice = 1.0)))
    assert(e.failures.exists(_.startsWith("price_range=")))
    assert(sender.sent.isEmpty, "no email on a gated run")
    assert(pipeline.pendingCommits.nonEmpty, "watermark must not be persisted")

    // relaxed gate: same checkpoint root still sees the full increment, then ships
    val (result, handle) = new ReportPipeline(spark, ckpt, sender).run(spec(maxPrice = 1e9))
    assert(result.count() > 0 && handle.nonEmpty)
    assert(sender.sent.size == 1)
  }

  test("a failed run leaves checkpoints untouched; the increment replays") {
    val failing = new EmailSender {
      override def send(m: EmailMessage): Boolean = throw new RuntimeException("smtp down")
    }
    val ckpt = tmpDir("graft-pipe-replay-")
    val spec = PipelineSpec(
      sources = Seq(
        SourceSpec("events", s"$sfDir/events.parquet", mode = LoadMode.Incremental, commitColumn = "ts")),
      transform = TransformSpec("SELECT count(*) AS n FROM events"),
      report = Some(ReportSpec("f@x", "t@x", "r", tmpDir("graft-pipe-replay-rep-"))))

    val broken = new ReportPipeline(spark, ckpt, failing)
    intercept[RuntimeException](broken.run(spec))
    assert(broken.pendingCommits.nonEmpty) // watermark pulled but NOT persisted

    // a healthy pipeline over the same checkpoint root sees the FULL increment
    val healthy = new ReportPipeline(spark, ckpt)
    val (result, _) = healthy.run(spec)
    assert(result.head.getLong(0) > 0)
    // and now the watermark is committed: next pull is empty
    healthy.loadSources(spec)
    assert(spark.table("events").count() == 0)
  }
}
