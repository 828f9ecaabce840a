package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixture oracles for the round-8 widening operators (the DuckDB gate
  * value-checks them at corpus scale; these pin the hand-checkable edge
  * semantics). */
class RoundEightOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // --- Classifier ----------------------------------------------------------

  test("classifier: integer sums match a hand-folded fixture; empty doc predicts class 0") {
    val seed = "graftclf"
    val buckets = 64
    val w = Classifier.weightTable(seed, buckets, classes = 3)
    // driver-side replay of the exact model on a known token list
    def bucketOf(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      var h = 0L
      var i = 15
      while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
      ((h >>> 1) % buckets).toInt
    }
    val toks = Seq("apple", "banana", "apple", "cherry")
    val expected = (0 until 3).map(c => toks.map(t => w(c)(bucketOf(t))).sum)

    val df = Seq((1L, "  Apple BANANA apple\tcherry "), (2L, "   ")).toDF("id", "text")
    val got = Classifier.scoreDocs(df, "text", buckets, classes = 3, seed = seed)
      .select(col("id"), col("n_tokens"), col("class_sums"), col("pred_class"))
      .as[(Long, Long, Seq[Long], Int)].collect().sortBy(_._1)

    assert(got(0)._2 == 4L)
    assert(got(0)._3 == expected)
    val best = expected.max
    assert(got(0)._4 == expected.indexOf(best)) // argmax, smallest class on ties
    // whitespace-only doc: zero tokens, all-zero sums, tie-break → class 0
    assert(got(1)._2 == 0L && got(1)._3 == Seq(0L, 0L, 0L) && got(1)._4 == 0)
  }

  test("classifier: weight table is within bounds and rebuilds deterministically") {
    val a = Classifier.weightTable("s", 32, 4)
    val b = Classifier.weightTable("s", 32, 4)
    assert(a == b)
    assert(a.flatten.forall(v => v >= -1000L && v <= 1000L))
    // different seed → different table (sanity that the seed is live)
    assert(Classifier.weightTable("s2", 32, 4) != a)
  }

  // --- Deterministic shuffle ----------------------------------------------

  test("deterministic shuffle: keys are stable across partitionings and shards balance") {
    val d = docs.select("doc_id")
    val once = Sampling.deterministicShuffle(d, "doc_id", "seedA", 8)
      .select("doc_id", "shuffle_key", "shard")
    val again = Sampling.deterministicShuffle(d.repartition(7), "doc_id", "seedA", 8)
      .select("doc_id", "shuffle_key", "shard")
    assert(once.exceptAll(again).isEmpty && again.exceptAll(once).isEmpty)

    // 63-bit keys non-negative; shard = key % 8
    val rows = once.as[(Long, Long, Int)].collect()
    assert(rows.forall { case (_, k, s) => k >= 0 && s == (k % 8).toInt })
    // uniform hash → no shard more than 3x the ideal share on 500 docs
    val counts = rows.groupBy(_._3).view.mapValues(_.size)
    assert(counts.size == 8 && counts.values.max <= 3 * (rows.length / 8))

    // a different seed produces a different permutation
    val other = Sampling.deterministicShuffle(d, "doc_id", "seedB", 8)
      .select("doc_id", "shuffle_key")
    assert(once.select("doc_id", "shuffle_key").exceptAll(other).count() > 0)
  }

  test("writeOrder: global ascending order by shuffle key across partitions") {
    val shuffled = Sampling.deterministicShuffle(docs.select("doc_id"), "doc_id", "s", 4)
    val ordered = Sampling.writeOrder(shuffled, 4)
    val keys = ordered.select("shuffle_key").as[Long].collect()
    assert(keys.length == 500 && (keys sameElements keys.sorted))
  }

  // --- Incremental IVF append ---------------------------------------------

  test("ivf append: delta assigned under the frozen quantizer; base partition untouched") {
    val e = embeddings
    val base = e.filter(col("vec_id") % 10 =!= 0)
    val delta = e.filter(col("vec_id") % 10 === 0)
    val model = Ann.trainIvf(spark, base, "embedding", "vec_id", nlist = 8)
    val baseIdx = Ann.buildIndex(base, "embedding", model)
    val appended = Ann.appendToIndex(baseIdx, delta, "embedding", model)

    // appended rows carry exactly the frozen model's assignment
    val fromAppend = appended.join(delta.select("vec_id"), "vec_id")
      .select(col("vec_id"), col("cluster"))
    val direct = delta.select(col("vec_id"), Ann.clusterOf(col("embedding"), model).as("cluster"))
    assert(fromAppend.exceptAll(direct).isEmpty && direct.exceptAll(fromAppend).isEmpty)

    // base rows pass through byte-identical (no reassignment, no loss)
    val baseThrough = appended.join(delta.select("vec_id"), Seq("vec_id"), "left_anti")
    assert(baseThrough.exceptAll(baseIdx).isEmpty && baseIdx.exceptAll(baseThrough).isEmpty)
    assert(appended.count() == e.count())
  }

  // --- Time-decayed aggregation -------------------------------------------

  test("decay: hand-computed weights, clamps at both ends, exact integer sums") {
    val ref = java.sql.Date.valueOf("2024-03-01")
    val rows = Seq(
      // age 0 days → units 0 → weight 2^4 = 16
      ("a", java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 2.50),
      // age 6 days, halfLife 7 → units 0 → 16
      ("a", java.sql.Timestamp.valueOf("2024-02-24 00:00:00"), 1.00),
      // age 7 days → units 1 → 8
      ("a", java.sql.Timestamp.valueOf("2024-02-23 23:59:59"), 1.00),
      // very old: units clamp at maxUnits 4 → weight 1
      ("b", java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 4.00),
      // future event (negative age) clamps to units 0 → 16
      ("b", java.sql.Timestamp.valueOf("2024-03-05 00:00:00"), 1.00)
    ).toDF("k", "ts", "value")
    val got = Decay.timeDecayedSum(rows.withColumn("__ref", lit(ref)),
        Seq("k"), "ts", "value", col("__ref"), halfLifeDays = 7, maxUnits = 4)
      .select(col("k"), col("n_events"), col("decayed_scaled"), col("decayed_score"))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    // a: 250*16 + 100*16 + 100*8 = 6400 ; b: 400*1 + 100*16 = 2000
    assert(got(0) == (("a", 3L, 6400L, 6400.0 / 1600.0)))
    assert(got(1) == (("b", 2L, 2000L, 2000.0 / 1600.0)))
  }

  // --- Length histogram sketch --------------------------------------------

  test("length histogram: merged row equals the whole-corpus sketch and quantiles bound ranks") {
    val got = Sketches.lengthHistogramBySource(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    val merged = got.find(_._1 == "__merged__").get
    // merged n_docs = sum of per-source n_docs (bin-wise-sum mergeability)
    assert(merged._2 == got.filter(_._1 != "__merged__").map(_._2).sum)
    // exact quantile sanity vs a driver-side sort of the real lengths
    val lens = docs.select(size(TextAnalysis.tokens(col("text"))).cast("long"))
      .as[Long].collect().sorted
    def exactP(p: Int): Long = lens((math.ceil(p / 100.0 * lens.length) - 1).toInt.max(0))
    // the bin upper bound must cover the exact quantile and its bin
    for ((pub, p) <- Seq((merged._3, 50), (merged._4, 90), (merged._5, 99))) {
      val exact = exactP(p)
      assert(pub >= exact, s"p$p ub $pub < exact $exact")
      // ceil-rank puts the exact quantile inside the reported bin, whose
      // ub = 2^b − 1 ≤ 2·exact − 1
      assert(pub <= 2 * exact.max(1) - 1, s"p$p ub $pub outside the exact value's bin")
    }
    // monotone: p50 <= p90 <= p99
    assert(merged._3 <= merged._4 && merged._4 <= merged._5)
  }

  test("bit-length bin: integer-exact edges at powers of two") {
    val got = Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("v")
      .select(Sketches.bitLengthBin(col("v"))).as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 2, 3, 3, 4, 10, 11))
  }

  // --- Padding stats -------------------------------------------------------

  test("padding stats: bucket assignment, clamping, and exact waste accounting") {
    val df = Seq(3L, 16L, 17L, 100L, 999L).toDF("n_tok")
    val got = Packing.paddingStats(df, "n_tok", Seq(16L, 32L, 128L))
      .select(col("bucket"), col("n_seqs"), col("n_tokens"), col("n_slots"), col("waste_ratio"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // bucket 16: lens 3,16 → 19 tokens / 32 slots; bucket 32: len 17;
    // bucket 128: len 100 and 999 clamped to 128
    assert(got.toSeq == Seq(
      (16L, 2L, 19L, 32L, 1.0 - 19.0 / 32.0),
      (32L, 1L, 17L, 32L, 1.0 - 17.0 / 32.0),
      (128L, 2L, 228L, 256L, 1.0 - 228.0 / 256.0)))
  }

  // --- Real pixel resize ---------------------------------------------------

  test("pixel resize: integer NN mapping matches a driver-side replay; small images pass through") {
    val ids = Seq(3L, 10L, 40L)
    val blobs = Multimodal.withEncodedImages(spark, ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.decodeResizeStats(blobs, maxDim = 16)
      .collect().map(r => r.doc_id -> r).toMap
    for (id <- ids) {
      val w = (id % 48 + 8).toInt
      val h = (id % 32 + 8).toInt
      val side = math.max(w, h)
      val (dw, dh) =
        if (side <= 16) (w, h)
        else (math.max(1, w * 16 / side), math.max(1, h * 16 / side))
      // driver-side replay of the quadrant closed form over dst pixels
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until dh; x <- 0 until dw) {
        val sx = x * w / dw
        val sy = y * h / dh
        val q = (if (sy < h / 2) 0 else 2) + (if (sx < w / 2) 0 else 1)
        er += (id * 3 + 31 * q + 7) % 256
        eg += (id * 5 + 31 * q + 7) % 256
        eb += (id * 7 + 31 * q + 7) % 256
      }
      val r = got(id)
      assert((r.dst_w, r.dst_h) == ((dw, dh)), s"doc $id dims")
      assert((r.sum_r, r.sum_g, r.sum_b) == ((er, eg, eb)), s"doc $id sums")
      // aspect is preserved within integer truncation: dst <= 16 always
      assert(r.dst_w <= 16 && r.dst_h <= 16)
    }
    // doc 3: 11x11 already fits maxDim 16 → byte-identical pass-through dims
    assert(got(3L).dst_w == 11 && got(3L).dst_h == 11)
  }

  // --- WAV/PCM audio decode ------------------------------------------------

  test("wav decode: round-trip stats match direct computation; junk chunk is walked") {
    // doc 6 gets the planted LIST chunk (6 % 3 == 0) — must parse anyway
    for (id <- Seq(5L, 6L)) {
      val blob = Audio.synthBlob(id)
      val got = Audio.decodeWavStats(id, blob.data)
      val n = (256 + id % 64).toInt
      val samples = (0 until n).map(i => ((id * 31 + i.toLong * 17) % 2001) - 1000)
      assert(got.n_frames == n.toLong)
      assert(got.sample_rate == 8000 + (id % 8).toInt * 1000)
      assert(got.n_channels == 1 && got.bits_per_sample == 16)
      assert(got.sum_abs == samples.map(math.abs).sum)
      assert(got.max_abs == samples.map(math.abs).max)
      assert(got.sum_sq == samples.map(s => s * s).sum)
    }
  }

  test("wav decode: stereo frames count once per frame, channels interleave into the sums") {
    // hand-built 2-channel PCM-16 WAV: frames (L,R) = (100,-200), (300,-400)
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(8)
    Seq(100, -200, 300, -400).foreach(s => bb.putShort(s.toShort))
    val got = Audio.decodeWavStats(1L, bb.array())
    assert(got.n_channels == 2 && got.n_frames == 2L)
    assert(got.sum_abs == 1000L && got.max_abs == 400L)
    assert(got.sum_sq == 100L * 100 + 200L * 200 + 300L * 300 + 400L * 400)
  }

  test("wav decode: two data chunks + odd-remainder len keep chunk alignment and a global frame index") {
    // data chunk 1: 3 mono frames with ONE trailing remainder byte
    // (len=7, not a frame multiple) + RIFF odd pad; then a junk chunk;
    // then data chunk 2 with 3 more frames. A parser that consumes only
    // whole frames would misread the junk tag; a per-chunk decimation
    // phase would re-anchor frame 0 at chunk 2.
    val samples = Seq[Short](10, -20, 30, 40, -50, 60)
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 16) + (8 + 7 + 1) + (8 + 4) + (8 + 6))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(7)
    samples.take(3).foreach(s => bb.putShort(s))
    bb.put(0x7f.toByte) // remainder byte inside the declared len
    bb.put(0x00.toByte) // RIFF pad for odd len
    bb.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0xdeadbeef)
    bb.put("data".getBytes("US-ASCII")).putInt(6)
    samples.drop(3).foreach(s => bb.putShort(s))
    val bytes = bb.array()
    val stats = Audio.decodeWavStats(1L, bytes)
    assert(stats.n_frames == 6L)
    assert(stats.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    // k=2 keeps GLOBAL frames 0,2,4 -> samples 10, 30, -50 (frame 4 is
    // the second chunk's first frame: the phase carries across chunks)
    val dec = Audio.decodeWavDecimatedStats(1L, bytes, k = 2)
    assert(dec.n_frames_out == 3L)
    assert(dec.sum_abs == 10L + 30L + 50L)
    assert(dec.max_abs == 50L)
    assert(dec.sum_sq == 100L + 900L + 2500L)
  }

  test("wav decode: non-RIFF and non-PCM payloads are rejected loudly") {
    intercept[IllegalArgumentException] {
      Audio.decodeWavStats(1L, "nonsense-bytes-here".getBytes("US-ASCII"))
    }
  }

  // --- Snapshot diff -------------------------------------------------------

  test("snapshot diff: added / removed / changed / unchanged classification") {
    val base = Seq((1L, "fa"), (2L, "fb"), (3L, "fc")).toDF("id", "fp")
    val next = Seq((2L, "fb"), (3L, "fc2"), (4L, "fd")).toDF("id", "fp")
    val got = Snapshot.diff(base, next, "id", "fp")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }
}
