package graft.sources

import graft.core.{FloatPacker, IndexMeta, Metric, SegmentMeta, SegmentState, VectorRecord}
import graft.index.Pq

/**
 * Hand-rolled proto3 wire-format codec for the reference engine's on-disk
 * value blobs, giving a migrating user a byte-level import/export path.
 *
 * Message layouts follow the reference schema
 * (reference: src/main/proto/vectorsearch.proto:31-155; runtime use in
 * tasks/ProtoSerializers.java — plain `toByteString`/`parseFrom`):
 *   - IndexMeta     (proto:31-68):  name=1, dimension=2, metric=3 enum,
 *     max_segment_size=4, pq_m=5, pq_k=6, graph_degree=7, oversample=8,
 *     graph_build_breadth=9, graph_alpha=10 double
 *   - SegmentMeta   (proto:74-101): segment_id=1, state=2 enum, count=3,
 *     created_at_ms=4, deleted_count=5, last_vacuum_at_ms=6
 *   - VectorRecord  (proto:108-126): seg_id=1, vec_id=2,
 *     embedding=3 bytes (packed LE float32), deleted=4 bool, payload=5 bytes
 *   - PQCodebook    (proto:133-141): m=1, k=2, centroids=3 repeated bytes
 *     (entry s packs that subspace's K centroids, K·(D/M) floats LE)
 *   - Adjacency     (proto:148-152): neighbor_ids=1 repeated int32 (packed)
 *
 * The encoder follows protobuf-java's canonical serialization so encoded
 * blobs are byte-identical to what the reference writes: fields emitted in
 * field-number order, proto3 implicit-presence defaults (0 / "" / false /
 * empty bytes / enum 0) omitted, packed encoding for repeated scalars.
 * The decoder is a general wire reader: any field order, unknown fields
 * skipped, last-wins scalars, packed-or-unpacked repeated scalars.
 *
 * The wire format itself (varint, tag = field<<3|type, wire types
 * 0/1/2/5) is the publicly documented protobuf encoding.
 */
object ProtoInterop {

  // ---------------------------------------------------------------- writer

  final class Writer {
    private var buf = new Array[Byte](64)
    private var len = 0

    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        var cap = buf.length * 2
        while (cap < len + n) cap *= 2
        buf = java.util.Arrays.copyOf(buf, cap)
      }

    def writeVarint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1
        v >>>= 7
      }
      buf(len) = v.toByte; len += 1
    }

    private def tag(field: Int, wireType: Int): Unit =
      writeVarint((field.toLong << 3) | wireType)

    /** int32/int64/uint/bool/enum field, skipped at proto3 default 0. */
    def int(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); writeVarint(v) }

    def bool(field: Int, v: Boolean): Unit = if (v) { tag(field, 0); writeVarint(1L) }

    def double(field: Int, v: Double): Unit =
      // protobuf-java's proto3 presence check is on the raw bits, so -0.0
      // IS serialized (doubleToRawLongBits(-0.0) != 0); `v != 0.0d` would
      // wrongly skip it and break byte-identity with the reference.
      if (java.lang.Double.doubleToRawLongBits(v) != 0L) {
        tag(field, 1)
        ensure(8)
        var bits = java.lang.Double.doubleToLongBits(v)
        var i = 0
        while (i < 8) { buf(len) = bits.toByte; len += 1; bits >>>= 8; i += 1 }
      }

    def bytes(field: Int, v: Array[Byte]): Unit =
      if (v != null && v.nonEmpty) {
        tag(field, 2)
        writeVarint(v.length.toLong)
        ensure(v.length)
        System.arraycopy(v, 0, buf, len, v.length)
        len += v.length
      }

    def string(field: Int, v: String): Unit =
      if (v != null && v.nonEmpty) bytes(field, v.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    /** Packed repeated int32/int64 (proto3 default for repeated scalars). */
    def packedInts(field: Int, vs: Array[Int]): Unit =
      if (vs != null && vs.nonEmpty) {
        var payload = 0
        var i = 0
        while (i < vs.length) { payload += varintSize(vs(i).toLong); i += 1 }
        tag(field, 2)
        writeVarint(payload.toLong)
        i = 0
        while (i < vs.length) { writeVarint(vs(i).toLong); i += 1 }
      }

    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private def varintSize(v0: Long): Int = {
    var v = v0; var n = 1
    while ((v & ~0x7fL) != 0L) { n += 1; v >>>= 7 }
    n
  }

  // ---------------------------------------------------------------- reader

  final class Reader(b: Array[Byte], from: Int, until: Int) {
    def this(b: Array[Byte]) = this(b, 0, b.length)
    private var pos = from

    def hasNext: Boolean = pos < until

    def readVarint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        require(pos < until, "truncated varint")
        val x = b(pos); pos += 1
        out |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint too long")
      }
      out
    }

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readDouble(): Double = {
      require(pos + 8 <= until, "truncated fixed64")
      var bits = 0L
      var i = 7
      while (i >= 0) { bits = (bits << 8) | (b(pos + i) & 0xffL); i -= 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }

    /** Length prefix validated as a Long BEFORE narrowing: a corrupt blob
      * declaring e.g. 2^32+5 must fail the truncation check, not wrap to 5
      * and decode garbage silently. */
    private def readLen(what: String): Int = {
      val n = readVarint()
      require(n >= 0L && n <= (until - pos).toLong, s"truncated $what")
      n.toInt
    }

    def readBytes(): Array[Byte] = {
      val n = readLen("bytes field")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }

    /** Sub-reader over a length-delimited payload (embedded message / packed). */
    def subReader(): Reader = {
      val n = readLen("length-delimited field")
      val r = new Reader(b, pos, pos + n)
      pos += n
      r
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint(); ()
      case 1 => require(pos + 8 <= until, "truncated fixed64"); pos += 8
      case 2 => subReader(); ()
      case 5 => require(pos + 4 <= until, "truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  // ------------------------------------------------------------- IndexMeta

  private val MetricEnum = Map(Metric.L2.name -> 0L, Metric.Cosine.name -> 1L)
  private val MetricFromEnum = MetricEnum.map(_.swap)

  def encodeIndexMeta(m: IndexMeta): Array[Byte] = {
    val w = new Writer
    w.string(1, m.name)
    w.int(2, m.dimension.toLong)
    w.int(3, MetricEnum(m.metricEnum.name))
    w.int(4, m.maxSegmentSize.toLong)
    w.int(5, m.pqM.toLong)
    w.int(6, m.pqK.toLong)
    w.int(7, m.graphDegree.toLong)
    w.int(8, m.oversample.toLong)
    w.int(9, m.graphBuildBreadth.toLong)
    w.double(10, m.graphAlpha)
    w.result()
  }

  def decodeIndexMeta(b: Array[Byte]): IndexMeta = {
    var name = ""; var dim = 0; var metric = 0L; var maxSeg = 0; var pqM = 0
    var pqK = 0; var degree = 0; var oversample = 0; var breadth = 0; var alpha = 0.0
    val r = new Reader(b)
    while (r.hasNext) r.readTag() match {
      case (1, 2) => name = new String(r.readBytes(), java.nio.charset.StandardCharsets.UTF_8)
      case (2, 0) => dim = r.readVarint().toInt
      case (3, 0) => metric = r.readVarint()
      case (4, 0) => maxSeg = r.readVarint().toInt
      case (5, 0) => pqM = r.readVarint().toInt
      case (6, 0) => pqK = r.readVarint().toInt
      case (7, 0) => degree = r.readVarint().toInt
      case (8, 0) => oversample = r.readVarint().toInt
      case (9, 0) => breadth = r.readVarint().toInt
      case (10, 1) => alpha = r.readDouble()
      case (_, wt) => r.skip(wt)
    }
    // Reference blobs may carry proto3 zero-defaults for tuning fields the
    // creator never set; fall back to this engine's defaults there, but
    // require the identity/shape fields.
    IndexMeta(
      name = name,
      dimension = dim,
      // Unknown enum values (a future METRIC_* from a newer schema) fail
      // loudly: silently defaulting to L2 would return wrong distances.
      // Enum 0 (= L2) is the valid proto3 default for an omitted field.
      metric = MetricFromEnum.getOrElse(
        metric,
        throw new IllegalArgumentException(
          s"IndexMeta.metric: unknown Metric enum value $metric (this codec knows ${MetricEnum.values.toSeq.sorted.mkString(",")})")),
      maxSegmentSize = if (maxSeg > 0) maxSeg else IndexMeta.DefaultMaxSegmentSize,
      pqM = if (pqM > 0) pqM else IndexMeta.DefaultPqM,
      pqK = if (pqK > 0) pqK else IndexMeta.DefaultPqK,
      graphDegree = if (degree > 0) degree else IndexMeta.DefaultGraphDegree,
      graphBuildBreadth = if (breadth > 0) breadth else IndexMeta.DefaultGraphBuildBreadth,
      graphAlpha = if (alpha > 0.0) alpha else IndexMeta.DefaultGraphAlpha,
      oversample = if (oversample > 0) oversample else IndexMeta.DefaultOversample)
  }

  // ----------------------------------------------------------- SegmentMeta

  private val StateEnum = Map(
    SegmentState.Active -> 0L, SegmentState.Pending -> 1L, SegmentState.Sealed -> 2L,
    SegmentState.Compacting -> 3L, SegmentState.Writing -> 4L)
  private val StateFromEnum = StateEnum.map(_.swap)

  /** `buildAttempts`/`lastBuildError` are repo-side manifest bookkeeping
    * with no reference proto field; they reset on export/import. */
  def encodeSegmentMeta(m: SegmentMeta): Array[Byte] = {
    require(m.count <= Int.MaxValue, s"proto SegmentMeta.count is int32; got ${m.count}")
    val w = new Writer
    w.int(1, m.segId.toLong)
    w.int(2, StateEnum(m.state))
    w.int(3, m.count)
    w.int(4, m.createdAtMs)
    w.int(5, m.deletedCount)
    w.int(6, m.lastVacuumAtMs)
    w.result()
  }

  def decodeSegmentMeta(b: Array[Byte]): SegmentMeta = {
    var segId = 0; var state = 0L; var count = 0L; var createdAt = 0L
    var deleted = 0L; var lastVacuum = 0L
    val r = new Reader(b)
    while (r.hasNext) r.readTag() match {
      case (1, 0) => segId = r.readVarint().toInt
      case (2, 0) => state = r.readVarint()
      case (3, 0) => count = r.readVarint()
      case (4, 0) => createdAt = r.readVarint()
      case (5, 0) => deleted = r.readVarint()
      case (6, 0) => lastVacuum = r.readVarint()
      case (_, wt) => r.skip(wt)
    }
    SegmentMeta(
      segId = segId,
      state = StateFromEnum.getOrElse(state, SegmentState.Active),
      count = count,
      deletedCount = deleted,
      createdAtMs = createdAt,
      lastVacuumAtMs = lastVacuum)
  }

  // ---------------------------------------------------------- VectorRecord

  /** The reference derives global ids from (seg_id, vec_id) key tuples
    * rather than storing them in the record (vectorsearch.proto:110-112);
    * `gid` is therefore not part of the wire blob. */
  def encodeVectorRecord(rec: VectorRecord): Array[Byte] = {
    val w = new Writer
    w.int(1, rec.segId.toLong)
    w.int(2, rec.vecId.toLong)
    w.bytes(3, FloatPacker.pack(rec.embedding))
    w.bool(4, rec.deleted)
    w.bytes(5, rec.payload)
    w.result()
  }

  /** `gid` is reconstructed by the caller's (segId, vecId) → gid mapping —
    * the Tuple-pack convention the reference uses for external ids. */
  def decodeVectorRecord(b: Array[Byte], gid: (Int, Int) => Long): VectorRecord = {
    var segId = 0; var vecId = 0
    var embedding: Array[Byte] = Array.emptyByteArray
    var deleted = false
    var payload: Array[Byte] = Array.emptyByteArray
    val r = new Reader(b)
    while (r.hasNext) r.readTag() match {
      case (1, 0) => segId = r.readVarint().toInt
      case (2, 0) => vecId = r.readVarint().toInt
      case (3, 2) => embedding = r.readBytes()
      case (4, 0) => deleted = r.readVarint() != 0L
      case (5, 2) => payload = r.readBytes()
      case (_, wt) => r.skip(wt)
    }
    VectorRecord(segId, vecId, gid(segId, vecId), FloatPacker.unpack(embedding), deleted, payload)
  }

  // ------------------------------------------------------------ PQCodebook

  /** Proto entry s packs subspace s's K centroids (K·subDim floats LE) —
    * exactly our flat layout's [s·k·subDim, (s+1)·k·subDim) slice. */
  def encodeCodebook(cb: Pq.Codebook): Array[Byte] = {
    val w = new Writer
    w.int(1, cb.m.toLong)
    w.int(2, cb.k.toLong)
    val per = cb.k * cb.subDim
    var s = 0
    while (s < cb.m) {
      w.bytes(3, FloatPacker.pack(java.util.Arrays.copyOfRange(cb.centroids, s * per, (s + 1) * per)))
      s += 1
    }
    w.result()
  }

  def decodeCodebook(b: Array[Byte]): Pq.Codebook = {
    var m = 0; var k = 0
    val subs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val r = new Reader(b)
    while (r.hasNext) r.readTag() match {
      case (1, 0) => m = r.readVarint().toInt
      case (2, 0) => k = r.readVarint().toInt
      case (3, 2) => subs += FloatPacker.unpack(r.readBytes())
      case (_, wt) => r.skip(wt)
    }
    require(m > 0 && k > 0, s"PQCodebook missing m/k (m=$m k=$k)")
    require(subs.size == m, s"PQCodebook has ${subs.size} centroid entries for m=$m")
    val per = subs.head.length
    require(per % k == 0, s"subspace centroid block $per not divisible by k=$k")
    require(subs.forall(_.length == per), "ragged PQCodebook centroid entries")
    val flat = new Array[Float](m * per)
    var s = 0
    while (s < m) { System.arraycopy(subs(s), 0, flat, s * per, per); s += 1 }
    Pq.Codebook(m, k, per / k, flat)
  }

  // ------------------------------------------------------------- Adjacency

  def encodeAdjacency(neighborIds: Array[Int]): Array[Byte] = {
    val w = new Writer
    w.packedInts(1, neighborIds)
    w.result()
  }

  def decodeAdjacency(b: Array[Byte]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val r = new Reader(b)
    while (r.hasNext) r.readTag() match {
      case (1, 2) => // packed (proto3 writer default)
        val sub = r.subReader()
        while (sub.hasNext) out += sub.readVarint().toInt
      case (1, 0) => out += r.readVarint().toInt // unpacked writer compat
      case (_, wt) => r.skip(wt)
    }
    out.toArray
  }
}
