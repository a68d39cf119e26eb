package graft

import graft.functions.{GraftHash, MinHashMix, TopKBuffer}

import scala.util.Random

/** Randomized-property checks for the imperative kernels: each is
  * compared to an obviously-correct reference implementation over many
  * seeded-random inputs (seeded → reproducible failures).
  */
class PropertySpec extends SparkSpec {

  private def trials(n: Int)(body: Random => Unit): Unit =
    (1 to n).foreach(i => body(new Random(i * 7919L)))

  test("TopKBuffer equals sort-take-k on random inputs, incl. serialization") {
    trials(200) { rnd =>
      val xs = List.fill(rnd.nextInt(40))((rnd.nextInt(2000) / 2.0 - 500, rnd.nextInt(50).toLong))
      val k = 1 + rnd.nextInt(8)
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.insert(s, i) }
      val viaHeap = TopKBuffer.fromBytes(buf.toBytes).sortedDesc.toSeq
      val reference = xs.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(viaHeap == reference, s"k=$k xs=$xs")
    }
  }

  test("TopKBuffer merge is equivalent to inserting both streams") {
    trials(200) { rnd =>
      def stream() = List.fill(rnd.nextInt(30))((rnd.nextInt(200).toDouble, rnd.nextInt(20).toLong))
      val (a, b) = (stream(), stream())
      val merged = new TopKBuffer(5)
      a.foreach { case (s, i) => merged.insert(s, i) }
      val other = new TopKBuffer(5)
      b.foreach { case (s, i) => other.insert(s, i) }
      merged.mergeFrom(other)
      val direct = new TopKBuffer(5)
      (a ++ b).foreach { case (s, i) => direct.insert(s, i) }
      assert(merged.sortedDesc.toSeq == direct.sortedDesc.toSeq)
    }
  }

  test("hashedShingles kernel equals the naive n-gram set") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = Vector("a", "b", "c", "dd", "e1", "longword")
    trials(300) { rnd =>
      val words = List.fill(rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
      val n = 1 + rnd.nextInt(6)
      val arr = new GenericArrayData(words.map(w => UTF8String.fromString(w)).toArray[Any])
      val out = GraftHash.hashedShingles(arr, n)
      val kernel = (0 until out.numElements()).map(out.getLong).toSeq
      val naive = words.sliding(n).filter(_.size == n).toSeq
        .map { gram =>
          var h = GraftHash.Offset
          gram.foreach { w => h = MinHashMix.mix(h ^ GraftHash.fnv1a64(w.getBytes("UTF-8")), n) }
          h
        }
        .distinct.sorted
      assert(kernel == naive, s"words=$words n=$n")
    }
  }

  test("MinHash signature is order-insensitive and monotone under union") {
    trials(200) { rnd =>
      val hs = List.fill(1 + rnd.nextInt(50))(rnd.nextLong())
      val sig = MinHashMix.signature(hs.toArray, 16).toSeq
      val shuffled = MinHashMix.signature(rnd.shuffle(hs).toArray, 16).toSeq
      assert(sig == shuffled) // set semantics
      val withMore = MinHashMix.signature((hs ++ List(42L, 43L)).toArray, 16).toSeq
      assert(withMore.zip(sig).forall { case (a, b) => a <= b }) // mins only decrease
    }
  }

  test("checkpoint values round-trip for arbitrary strings") {
    val store = new graft.sources.CheckpointStore(
      tmpDir("graft-prop-ckpt-"), spark.sparkContext.hadoopConfiguration)
    val pieces = Vector("\"", "\\", "\n", "\\n", "a\"b", "\\\"", "x\\\\y", "plain", "12:34", "")
    trials(50) { rnd =>
      val s = List.fill(rnd.nextInt(6))(pieces(rnd.nextInt(pieces.size))).mkString
      store.write(graft.sources.Checkpoint("t", s, "/p"))
      assert(store.read("t").get.lastProcessedCommit == s, s"value=${s.map(_.toInt)}")
    }
  }

  test("upsert merge equals window-merge on random key collisions") {
    val s = spark
    import s.implicits._
    trials(10) { rnd =>
      val rows = List.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, rnd.nextInt(1000)))
      val df = rows.toDF("k", "ver", "payload")
      val a = graft.sources.UpsertWriter.merge(df, Seq("k"), "ver", Seq("payload"))
      val b = graft.sources.UpsertWriter.mergeViaWindow(df, Seq("k"), "ver", Seq("payload"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    }
  }

  test("ewma equals the naive per-entity fold on random inputs (incl. timestamp ties)") {
    val s = spark
    import s.implicits._
    trials(6) { rnd =>
      val rows = (1 to 60).map { i =>
        (rnd.nextInt(4).toLong,                    // entity
          i.toLong,                                // unique id
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(5) * 1000L), // deliberate ties
          rnd.nextInt(1000).toLong)                // cents
      }
      val df = rows.toDF("u", "id", "t", "cents")
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._3.getTime, r._2))
        sorted.scanLeft((0L, -1L)) { case ((acc, _), r) =>
          (if (r._2 == sorted.head._2) r._4 else (acc + r._4) / 2, r._2)
        }.drop(1)
      }.map { case (e, id) => id -> e }.toMap
      val got = graft.operators.EventAnalytics.ewma(df, "u", "t", "id", "cents")
        .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
      assert(got == expected)
    }
  }

  test("duplicatedSpanExcision equals the naive reference on random tiny-alphabet corpora") {
    trials(8) { rnd =>
      val w = 2 + rnd.nextInt(3)
      val vocab = Array("aa", "bb", "cc", "dd")
      val docs = (1 to 6).map(i =>
        i.toLong -> List.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      // naive reference: count every w-window string corpus-wide,
      // excise positions covered by any window seen >= 2 times
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val counts = toks.flatMap { case (_, ts) =>
        ts.sliding(w).filter(_.length == w).map(_.mkString(" "))
      }.groupBy(identity).view.mapValues(_.size).toMap
      val expected = toks.map { case (id, ts) =>
        val starts = (0 to ts.length - w).filter(p =>
          ts.length >= w && counts(ts.slice(p, p + w).mkString(" ")) >= 2)
        val cov = starts.flatMap(p => p until p + w).toSet
        val clean = ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }.mkString(" ")
        id -> ((clean, ts.length.toLong, cov.size.toLong))
      }.toMap
      val got = graft.operators.Dedup.duplicatedSpanExcision(docsDf(docs), w = w)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expected, s"w=$w docs=$docs")
    }
  }

  test("Delta DV codec round-trips random 64-bit position sets (both Z85 and sidecar forms)") {
    import graft.sources.DeltaDv
    trials(100) { rnd =>
      // positions spread over several high-32-bit keys, including
      // container boundaries and the unsigned-int upper half
      val ps = (0 until rnd.nextInt(60)).map { _ =>
        val key = rnd.nextInt(4).toLong
        val low = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(100).toLong
          case 1 => 0xFFFFL + rnd.nextInt(100)
          case 2 => 0x7FFFFFFFL - rnd.nextInt(100)
          case _ => 0x80000000L + rnd.nextInt(100) // above Int.MaxValue
        }
        (key << 32) | low
      }.distinct.sorted
      assert(DeltaDv.deserializePositions(DeltaDv.serializePositions(ps)).toSeq == ps,
        s"ps=$ps")
      // z85 round trip on random byte blobs of every length mod 4
      val blob = Array.fill[Byte](rnd.nextInt(37))(rnd.nextInt().toByte)
      assert(DeltaDv.z85Decode(DeltaDv.z85Encode(blob)).take(blob.length).toSeq == blob.toSeq)
    }
  }

  test("Delta DV snapshot equals the anti-filter reference on random delete sets") {
    import graft.sources.{DeltaDv, DeltaTableReader, DeltaTableWriter}
    val s = spark
    import s.implicits._
    trials(5) { rnd =>
      val table = tmpDir("prop-dv") + "/t"
      val n = 50 + rnd.nextInt(150)
      DeltaTableWriter.create(
        (1 to n).map(i => (i.toLong, i % 7)).toDF("id", "g"), table)
      val files = DeltaTableReader.activeFiles(spark, table)
      // random positions per file, written in randomly-chosen forms
      val conf = spark.sparkContext.hadoopConfiguration
      val perFile = files.map { f =>
        val count = spark.read.parquet(s"$table/${f.path}").count()
        val kill = (0L until count).filter(_ => rnd.nextBoolean())
        (f.path, count, kill)
      }
      val lines = perFile.flatMap { case (rel, _, kill) =>
        if (kill.isEmpty) Nil
        else {
          val d =
            if (rnd.nextBoolean()) DeltaDv.inlineDescriptor(kill)
            else DeltaDv.writeSidecar(conf, table, Seq(kill)).head
          Seq(
            s"""{"remove":{"path":"$rel","deletionTimestamp":1,"dataChange":true}}""",
            s"""{"add":{"path":"$rel","partitionValues":{},"size":1,"modificationTime":1,""" +
              s""""dataChange":true,"deletionVector":${DeltaDv.descriptorJson(d)}}}""")
        }
      }
      if (lines.nonEmpty) {
        val w = new java.io.PrintWriter(
          new java.io.File(s"$table/_delta_log", f"${1L}%020d.json"), "UTF-8")
        try lines.foreach(w.println) finally w.close()
      }
      // reference: per file, keep rows whose position is not killed
      val expected = perFile.map { case (rel, count, kill) =>
        val killSet = kill.toSet
        spark.read.parquet(s"$table/$rel")
          .withColumn("_p", org.apache.spark.sql.functions.col("_metadata.row_index"))
          .collect().filterNot(r => killSet(r.getLong(r.length - 1)))
          .map(r => (r.getLong(0), r.getInt(1))).toSet
      }.reduce(_ ++ _)
      val got = DeltaTableReader.snapshot(spark, table)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected, s"n=$n")
    }
  }
}
