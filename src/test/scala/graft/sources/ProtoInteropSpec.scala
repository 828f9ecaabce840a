package graft.sources

import graft.core.{IndexMeta, Metric, SegmentMeta, SegmentState, VectorRecord}
import graft.index.Pq
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden-blob and round-trip tests for the hand-rolled proto3 codec.
 *
 * Golden hex strings are hand-derived from the public protobuf wire
 * format (and cross-checked with an independent minimal encoder) for the
 * reference's message layouts (vectorsearch.proto:31-155), canonical
 * protobuf-java serialization: field-number order, proto3 defaults
 * omitted, packed repeated scalars.
 */
class ProtoInteropSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("IndexMeta golden blob is byte-exact and round-trips") {
    val m = IndexMeta(name = "idx", dimension = 8, metric = Metric.Cosine.name,
      maxSegmentSize = 100, pqM = 2, pqK = 4, graphDegree = 3, oversample = 2,
      graphBuildBreadth = 12, graphAlpha = 1.2)
    val golden = "0a036964781008180120642802300438034002480c51333333333333f33f"
    assert(hex(ProtoInterop.encodeIndexMeta(m)) === golden)
    val back = ProtoInterop.decodeIndexMeta(unhex(golden))
    assert(back === m.copy(graphBuildMode = back.graphBuildMode))
  }

  test("IndexMeta with L2 metric omits the zero enum; decode restores defaults") {
    val m = IndexMeta(name = "i2", dimension = 4, metric = Metric.L2.name,
      maxSegmentSize = 10, pqM = 2, pqK = 4, graphDegree = 3, oversample = 2,
      graphBuildBreadth = 12, graphAlpha = 0.0)
    // graphAlpha = 0.0 means "pruning disabled" upstream; as a proto3
    // default it vanishes from the wire and decode restores our default.
    val golden = "0a0269321004200a2802300438034002480c"
    assert(hex(ProtoInterop.encodeIndexMeta(m)) === golden)
    val back = ProtoInterop.decodeIndexMeta(unhex(golden))
    assert(back.metric === Metric.L2.name)
    assert(back.graphAlpha === IndexMeta.DefaultGraphAlpha)
  }

  test("SegmentMeta golden blob is byte-exact and round-trips") {
    val m = SegmentMeta(segId = 7, state = SegmentState.Sealed, count = 12345L,
      deletedCount = 42L, createdAtMs = 1723000000000L, lastVacuumAtMs = 1723000500000L)
    val golden = "0807100218b96020809cb6d69232282a30a0ded4d69232"
    assert(hex(ProtoInterop.encodeSegmentMeta(m)) === golden)
    assert(ProtoInterop.decodeSegmentMeta(unhex(golden)) === m)
  }

  test("SegmentMeta ACTIVE zero-state is omitted on the wire") {
    val m = SegmentMeta(segId = 0, state = SegmentState.Active, count = 1L,
      deletedCount = 0L, createdAtMs = 5L)
    assert(hex(ProtoInterop.encodeSegmentMeta(m)) === "18012005")
    assert(ProtoInterop.decodeSegmentMeta(unhex("18012005")) === m)
  }

  test("VectorRecord golden blob is byte-exact; gid reconstructed by mapping") {
    val rec = VectorRecord(segId = 0, vecId = 3, gid = 3L,
      embedding = Array(1.5f, -2.25f), deleted = true, payload = Array[Byte](1, 2))
    val golden = "10031a080000c03f000010c020012a020102"
    assert(hex(ProtoInterop.encodeVectorRecord(rec)) === golden)
    val back = ProtoInterop.decodeVectorRecord(unhex(golden), (s, v) => s.toLong * 1000 + v)
    assert(back.segId === 0 && back.vecId === 3 && back.gid === 3L)
    assert(back.embedding.toSeq === Seq(1.5f, -2.25f))
    assert(back.deleted && back.payload.toSeq === Seq[Byte](1, 2))
  }

  test("PQCodebook golden blob is byte-exact and round-trips the flat layout") {
    val cb = Pq.Codebook(m = 2, k = 2, subDim = 1, centroids = Array(0f, 1f, 2f, 3f))
    val golden = "080210021a08000000000000803f1a080000004000004040"
    assert(hex(ProtoInterop.encodeCodebook(cb)) === golden)
    val back = ProtoInterop.decodeCodebook(unhex(golden))
    assert(back.m === 2 && back.k === 2 && back.subDim === 1)
    assert(back.centroids.toSeq === Seq(0f, 1f, 2f, 3f))
  }

  test("Adjacency packs repeated int32 (proto3 packed default)") {
    val golden = "0a040105ac02"
    assert(hex(ProtoInterop.encodeAdjacency(Array(1, 5, 300))) === golden)
    assert(ProtoInterop.decodeAdjacency(unhex(golden)).toSeq === Seq(1, 5, 300))
    assert(ProtoInterop.encodeAdjacency(Array.empty[Int]).isEmpty)
  }

  test("decoder tolerates unpacked repeated ints, unknown fields, any order") {
    // unpacked neighbor_ids (08 01 08 05) + unknown field 9 varint + field 1 packed
    val mixed = unhex("08010805" + "4807" + "0a02ac02")
    assert(ProtoInterop.decodeAdjacency(mixed).toSeq === Seq(1, 5, 300))
    // VectorRecord fields in reverse order, unknown LD field 15
    val rev = unhex("2a020102" + "2001" + "1a080000c03f000010c0" + "1003" + "7a03aabbcc")
    val back = ProtoInterop.decodeVectorRecord(rev, (_, v) => v.toLong)
    assert(back.vecId === 3 && back.deleted && back.embedding.length === 2)
  }

  test("malformed blobs fail loudly: truncated varint, truncated bytes, bad codebook") {
    // truncated varint (continuation bit set, stream ends)
    intercept[IllegalArgumentException] {
      ProtoInterop.decodeSegmentMeta(unhex("08ff"))
    }
    // length-delimited field claims more bytes than remain
    intercept[IllegalArgumentException] {
      ProtoInterop.decodeVectorRecord(unhex("1a0a0000"), (_, v) => v.toLong)
    }
    // codebook with missing m/k
    intercept[IllegalArgumentException] {
      ProtoInterop.decodeCodebook(unhex("1a040000803f"))
    }
    // codebook whose centroid entry count disagrees with m
    intercept[IllegalArgumentException] {
      ProtoInterop.decodeCodebook(unhex("080210021a04" + "0000803f"))
    }
    // unsupported wire type in skip path (wire type 3 = group start)
    intercept[IllegalArgumentException] {
      ProtoInterop.decodeAdjacency(unhex("7b"))
    }
  }

  test("unknown Metric enum value fails loudly instead of defaulting to L2") {
    // field 3 (metric) = 2 — a future METRIC_DOT from a newer schema.
    // Silently mapping it to L2 would answer queries with wrong distances.
    val ex = intercept[IllegalArgumentException] {
      ProtoInterop.decodeIndexMeta(unhex("0a03696478100818022064"))
    }
    assert(ex.getMessage.contains("unknown Metric enum value 2"))
    // enum 0 (omitted field) is still the valid proto3 L2 default
    assert(ProtoInterop.decodeIndexMeta(unhex("0a036964781020")).metricEnum === Metric.L2)
  }

  test("64-bit length prefix fails the truncation check instead of wrapping") {
    // embedding field declares length 2^32+5; a 32-bit narrow would wrap
    // to 5 and silently decode the next 5 bytes as the payload.
    val blob = unhex("1a85808080100000000000")
    intercept[IllegalArgumentException] {
      ProtoInterop.decodeVectorRecord(blob, (_, v) => v.toLong)
    }
  }

  test("graphAlpha = -0.0 is serialized (raw-bits presence, protobuf-java parity)") {
    val m = IndexMeta(name = "idx", dimension = 8, metric = Metric.Cosine.name,
      maxSegmentSize = 100, pqM = 2, pqK = 4, graphDegree = 3, oversample = 2,
      graphBuildBreadth = 12, graphAlpha = -0.0)
    val enc = hex(ProtoInterop.encodeIndexMeta(m))
    // field 10 fixed64 tag 0x51 + LE bits of -0.0 (sign bit only)
    assert(enc.endsWith("510000000000000080"))
    // decode applies the reference's zero-default fallback (alpha <= 0)
    assert(ProtoInterop.decodeIndexMeta(unhex(enc)).graphAlpha === IndexMeta.DefaultGraphAlpha)
    // and +0.0 stays omitted from the wire
    val enc0 = hex(ProtoInterop.encodeIndexMeta(m.copy(graphAlpha = 0.0)))
    assert(!enc0.contains("51" + "0" * 16))
  }

  test("varint boundaries round-trip (multi-byte lengths and int64 values)") {
    val m = SegmentMeta(segId = Int.MaxValue, state = SegmentState.Compacting,
      count = Int.MaxValue.toLong, deletedCount = Long.MaxValue / 2,
      createdAtMs = Long.MaxValue, lastVacuumAtMs = 1L)
    assert(ProtoInterop.decodeSegmentMeta(ProtoInterop.encodeSegmentMeta(m)) === m)
    val big = VectorRecord(1, 200, 0L, Array.fill(300)(0.125f), deleted = false,
      payload = Array.fill(200)(7.toByte))
    val b2 = ProtoInterop.decodeVectorRecord(ProtoInterop.encodeVectorRecord(big), (_, _) => 0L)
    assert(b2.embedding.length === 300 && b2.payload.length === 200 && !b2.deleted)
  }
}
