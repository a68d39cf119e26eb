package graft.operators

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant avoids the O(n²) pair space.
  *  - exact: one hash aggregate (map-side combine) on the content.
  *  - n-gram Jaccard: inverted-index self-join — pairs only exist
  *    where a shingle is shared.
  *  - MinHash LSH: banded signatures; candidate pairs only within a
  *    band bucket; exact Jaccard verification on candidates only.
  *  - SimHash: 16-bit chunk buckets; Hamming verification within.
  *  - embedding: threshold join on cosine (exact kernel), with the
  *    LSH variant in Similarity as the 100 TB path.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical content.
    * Single hash aggregate; `max_by` over the negated id gives
    * min-by without a sort.
    */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(col(contentCol).as("_graft_key"))
      .agg(min_by(payload, col(idCol)).as("_graft_row"))
      .select(col("_graft_row.*"))
  }

  /** Word n-gram shingle set per doc: distinct space-joined n-grams. */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(0))),
      i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  /** Pairs (doc_a < doc_b) with n-gram Jaccard >= threshold, via an
    * inverted-index join: explode shingles, join on shingle, count
    * shared, Jaccard = |∩| / (|A| + |B| - |∩|). Never enumerates
    * non-overlapping pairs.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc"), explode(shingles(col(textCol), n)).as("sh"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("nsh"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("nsh", "nsh_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("nsh", "nsh_b"), "doc_b")
      .withColumn("jaccard", col("common").cast("double") / (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingles of xxhash64(shingle, seed-salt).
    * Pure higher-order functions — computed in one projection, no
    * explode, no shuffle.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleArr, sh => xxhash64(sh, seed))))

  /** MinHash LSH near-dup candidate pairs, verified by exact Jaccard.
    *
    * bands × rowsPerBand = signature length. Two docs collide if any
    * band of their signatures matches exactly; collision probability
    * follows the usual (1 - (1 - j^r)^b) S-curve. Candidates are then
    * verified with true shingle-set Jaccard, so the output contains
    * no false positives — only recall is approximate.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band key = (band index, hash of the band's slice of the signature)
    val bandKeys = (0 until bands).map(b =>
      xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)), lit(b)))
    val banded = withSig.select(
      col("doc"), col("sh"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))

    val a = banded.select(col("band"), col("bkey"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")

    // Exact verification on the candidate set only.
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    candidates
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash over word tokens, banded
    * into 4 × 16-bit chunks (any equal chunk => candidate, catching
    * all pairs with Hamming distance <= 3 by pigeonhole... candidates
    * verified with exact bit_count(xor) <= maxHamming).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sig = HashFunctions.simhash64(split(col(textCol), " "))
    val withSig = df.select(col(idCol).as("doc"), sig.as("sig"))
    val chunkKeys = (0 until 4).map(c =>
      shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)))
    val chunked = withSig.select(
      col("doc"), col("sig"),
      posexplode(array(chunkKeys: _*)).as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"), col("doc").as("doc_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("doc").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
