package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg SORT ORDERS (iceberg.apache.org spec "Sort Orders"): table
  * metadata declares `sort-orders` + `default-sort-order-id`, data
  * files record the order they were written under via
  * `data_file.sort_order_id`, and sorting on write is ADVISORY — an
  * unsorted append to a sorted table is legal, it just lands
  * unstamped. The writer's obligations under test: the declared
  * order's spec shape, verbatim carriage across commits (including
  * commits that don't sort), append re-sorting under the SAME order
  * id (no node churn), and the range-clustered layout actually
  * cutting file sets under bounds skipping.
  */
class IcebergSortOrderSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  /** Rewrite a metadata file in place AS AN EXTERNAL ENGINE WOULD —
    * Hadoop's LocalFileSystem keeps a `.crc` sidecar per file it
    * wrote, and an out-of-band edit must drop it (a real object store
    * has no sidecar at all).
    */
  private def rewrite(p: java.io.File, text: String): Unit = {
    val w = new java.io.PrintWriter(p, "UTF-8")
    try w.println(text) finally w.close()
    new java.io.File(p.getParentFile, s".${p.getName}.crc").delete(): Unit
  }

  private def metaJson(table: String): com.fasterxml.jackson.databind.JsonNode = {
    val hint = scala.io.Source.fromFile(s"$table/metadata/version-hint.text", "UTF-8")
    val v = try hint.mkString.trim finally hint.close()
    val src = scala.io.Source.fromFile(s"$table/metadata/v$v.metadata.json", "UTF-8")
    val text = try src.mkString finally src.close()
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
  }

  /** Every data_file.sort_order_id across the table's manifests
    * (None for entries whose schema lacks the field). */
  private def stampedOrderIds(table: String): Seq[Option[Int]] = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.file.DataFileReader
    new java.io.File(s"$table/metadata").listFiles()
      .filter(f => f.getName.startsWith("m-") && f.getName.endsWith(".avro"))
      .toSeq.flatMap { f =>
        val r = new DataFileReader[GenericRecord](f,
          new GenericDatumReader[GenericRecord]())
        try {
          val out = Seq.newBuilder[Option[Int]]
          while (r.hasNext) {
            val e = r.next()
            val dfr = e.get("data_file").asInstanceOf[GenericRecord]
            out += (if (dfr.getSchema.getField("sort_order_id") == null) None
              else Option(dfr.get("sort_order_id")).map(_.asInstanceOf[Int]))
          }
          out.result()
        } finally r.close()
      }
  }

  test("create sortBy: spec-shaped sort-orders, default id, stamped entries, file cut") {
    val table = tmpDir("isort-create") + "/t"
    IcebergTableWriter.create(df(1 to 4000), table, sortBy = Seq("id")): Unit
    val meta = metaJson(table)
    val orders = meta.get("sort-orders")
    assert(orders != null && orders.isArray && orders.size() == 2,
      "order-0 (unsorted, reserved) plus the declared order")
    assert(orders.get(0).get("order-id").asInt() == 0)
    assert(orders.get(0).get("fields").size() == 0)
    val declared = orders.get(1)
    assert(declared.get("order-id").asInt() == 1)
    val f0 = declared.get("fields").get(0)
    assert(f0.get("transform").asText() == "identity")
    assert(f0.get("source-id").asInt() == 1, "id is field 1 by the writer's numbering")
    assert(f0.get("direction").asText() == "asc")
    assert(f0.get("null-order").asText() == "nulls-first")
    assert(meta.get("default-sort-order-id").asInt() == 1)
    assert(IcebergTableReader.sortOrder(spark, table) ==
      Seq(("id", "asc", "nulls-first")))
    // every data file stamped with the order it was written under
    val stamps = stampedOrderIds(table)
    assert(stamps.nonEmpty && stamps.forall(_.contains(1)), s"stamps: $stamps")
    // the sorted layout must prune
    val full = IcebergTableReader.planFiles(spark, table)
    val cut = IcebergTableReader.planFilesSkipping(spark, table, "id", 0.0, 100.0)
    assert(full.data.size > 1, "fixture must land multiple files")
    assert(cut.data.size < full.data.size)
  }

  test("append re-sorts under the SAME order id; no node churn; both generations prune") {
    val table = tmpDir("isort-append") + "/t"
    IcebergTableWriter.create(df(1 to 4000), table, sortBy = Seq("id")): Unit
    val lowBefore = IcebergTableReader.planFilesSkipping(spark, table, "id", 0.0, 100.0)
    IcebergTableWriter.append(df(4001 to 8000), table): Unit
    val meta = metaJson(table)
    assert(meta.get("sort-orders").size() == 2,
      "the append must REUSE order 1, not mint a new node")
    assert(meta.get("default-sort-order-id").asInt() == 1)
    val stamps = stampedOrderIds(table)
    assert(stamps.forall(_.contains(1)),
      s"the appended batch's files must carry order 1 too: $stamps")
    // an all-high append adds NO files to the low slice — the batch
    // was range-clustered under the declared order
    val lowAfter = IcebergTableReader.planFilesSkipping(spark, table, "id", 0.0, 100.0)
    assert(lowAfter.data.size == lowBefore.data.size)
    assert(IcebergTableReader.snapshot(spark, table).agg(sum("id")).head().getLong(0) ==
      (1L to 8000L).sum)
  }

  test("unsorted tables declare the reserved order 0; sorted-table services keep the nodes") {
    val table = tmpDir("isort-plain") + "/t"
    IcebergTableWriter.create(df(1 to 100), table): Unit
    val meta = metaJson(table)
    assert(meta.get("sort-orders").size() == 1)
    assert(meta.get("sort-orders").get(0).get("order-id").asInt() == 0)
    assert(meta.get("default-sort-order-id").asInt() == 0)
    assert(IcebergTableReader.sortOrder(spark, table).isEmpty)
    assert(stampedOrderIds(table).forall(_.isEmpty), "unsorted files stay unstamped")
    // an UPSERT on a sorted table carries the declaration verbatim
    // (its own files land unstamped — spec-legal advisory sorting)
    val sorted = tmpDir("isort-upsert") + "/t"
    IcebergTableWriter.create(df(1 to 1000), sorted, sortBy = Seq("id")): Unit
    IcebergTableWriter.upsert(df(500 to 600), sorted, Seq("id")): Unit
    assert(IcebergTableReader.sortOrder(spark, sorted) ==
      Seq(("id", "asc", "nulls-first")))
    assert(metaJson(sorted).get("sort-orders").size() == 2)
    assert(IcebergTableReader.snapshot(spark, sorted).count() == 1000L)
  }

  test("rewriteDataFiles restores the sorted layout an upsert diluted and stamps the order") {
    val table = tmpDir("isort-rewrite") + "/t"
    IcebergTableWriter.create(df(1 to 4000), table, sortBy = Seq("id")): Unit
    // an upsert's data files land UNSORTED (spec-legal advisory) —
    // its replacement rows span the key space
    val s = spark
    import s.implicits._
    val touched = (1 to 4000 by 40).map(i => (i.toLong, "upd", i * 3L))
      .toDF("id", "grp", "v")
    IcebergTableWriter.upsert(touched, table, Seq("id")): Unit
    // the service rewrite re-sorts under the declared order: files
    // prune again and carry its id
    IcebergTableWriter.rewriteDataFiles(spark, table, targetFiles = 8): Unit
    val full = IcebergTableReader.planFiles(spark, table)
    val cut = IcebergTableReader.planFilesSkipping(spark, table, "id", 0.0, 100.0)
    assert(full.data.size > 1)
    assert(cut.data.size < full.data.size,
      s"post-rewrite files must prune (${cut.data.size} of ${full.data.size})")
    val stamps = stampedOrderIds(table)
    assert(stamps.flatten.nonEmpty && stamps.flatten.forall(_ == 1))
    assert(IcebergTableReader.snapshot(spark, table).count() == 4000L)
    assert(IcebergTableReader.snapshot(spark, table)
      .where(col("grp") === "upd").count() == 100L)
  }

  test("external orders: desc round-trips but is not re-sorted; non-identity answers empty; legacy metadata tolerated") {
    val table = tmpDir("isort-ext") + "/t"
    IcebergTableWriter.create(df(1 to 200), table, sortBy = Seq("id")): Unit
    // hand-flip the declared direction to desc, as an external engine
    // could have written it
    val hint = scala.io.Source.fromFile(s"$table/metadata/version-hint.text", "UTF-8")
    val v = try hint.mkString.trim finally hint.close()
    val p = new java.io.File(s"$table/metadata/v$v.metadata.json")
    val src = scala.io.Source.fromFile(p, "UTF-8")
    val text = try src.mkString finally src.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    root.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("sort-orders")
      .get(1).get("fields").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("direction", "desc"): Unit
    rewrite(p, root.toString)
    assert(IcebergTableReader.sortOrder(spark, table) ==
      Seq(("id", "desc", "nulls-first")))
    // a desc order is readable but this writer doesn't re-sort under
    // it — the append is spec-legal and unstamped, data exact
    IcebergTableWriter.append(df(201 to 300), table): Unit
    assert(IcebergTableReader.snapshot(spark, table).count() == 300L)
    // non-identity transform → advisory fallback: empty answer
    val t2 = tmpDir("isort-trunc") + "/t"
    IcebergTableWriter.create(df(1 to 50), t2, sortBy = Seq("id")): Unit
    val p2 = {
      val h = scala.io.Source.fromFile(s"$t2/metadata/version-hint.text", "UTF-8")
      val v2 = try h.mkString.trim finally h.close()
      new java.io.File(s"$t2/metadata/v$v2.metadata.json")
    }
    val src2 = scala.io.Source.fromFile(p2, "UTF-8")
    val root2 = mapper.readTree(try src2.mkString finally src2.close())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root2.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("sort-orders")
      .get(1).get("fields").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("transform", "truncate[4]"): Unit
    rewrite(p2, root2.toString)
    assert(IcebergTableReader.sortOrder(spark, t2).isEmpty)
    // metadata WITHOUT the field (older graft tables, minimal
    // external metadata): empty answer, appends fine, and the next
    // commit starts declaring the reserved order 0
    val t3 = tmpDir("isort-legacy") + "/t"
    IcebergTableWriter.create(df(1 to 50), t3): Unit
    val p3 = {
      val h = scala.io.Source.fromFile(s"$t3/metadata/version-hint.text", "UTF-8")
      val v3 = try h.mkString.trim finally h.close()
      new java.io.File(s"$t3/metadata/v$v3.metadata.json")
    }
    val src3 = scala.io.Source.fromFile(p3, "UTF-8")
    val root3 = mapper.readTree(try src3.mkString finally src3.close())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    root3.remove("sort-orders"); root3.remove("default-sort-order-id"): Unit
    rewrite(p3, root3.toString)
    assert(IcebergTableReader.sortOrder(spark, t3).isEmpty)
    IcebergTableWriter.append(df(51 to 80), t3): Unit
    assert(metaJson(t3).get("sort-orders").size() == 1)
    assert(metaJson(t3).get("default-sort-order-id").asInt() == 0)
    assert(IcebergTableReader.snapshot(spark, t3).count() == 80L)
  }
}
