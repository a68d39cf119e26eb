package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared contract of the query catalog: the (run, oracle) pair every
  * registered query provides, plus the table-loading and scratch-dir
  * helpers the family traits build on. The catalog is a LINEAR trait
  * stack (QueryBase -> Reference -> Analytics -> Streaming -> LLM x2
  * -> Event -> Tpch -> [[Queries]]) so definition order — and
  * therefore initialization order — is exactly the old single-file
  * order, split into reviewable family modules.
  */
trait QueryBase {

  final case class QueryDef(
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableLoader.table(spark, dir, name)

  /** sum of a 2-decimal money expression, exact via decimal, returned as double */
  protected def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  protected def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  protected def scratch(name: String): String = {
    val p = s"/root/repo/target/graft-tmp/$name"
    val f = new java.io.File(p)
    if (f.exists()) deleteRecursively(f)
    f.mkdirs()
    p
  }

}
