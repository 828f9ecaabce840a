package graft.sources

import java.io.OutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WebDataset-style tar shards for multimodal corpora: a shard is one
 * POSIX ustar archive whose members are named `<key>.<ext>`, with all of
 * a sample's members stored CONTIGUOUSLY — the layout that lets training
 * loaders stream a shard sequentially (no random access, no index) and
 * parallelize across shards. This is the dominant on-disk shape for
 * image/audio/text sample corpora and the one ingestion format the
 * multimodal gates' parquet columns didn't cover.
 *
 * The ustar codec is hand-rolled (same discipline as
 * [[ProtoInterop]]'s proto3 codec and Audio's RIFF/WAVE walk): 512-byte
 * headers, octal size fields, checksum over a space-filled chksum field,
 * zero-padded data blocks, two zero blocks as terminator. mtime is
 * pinned to 0 so shard bytes are bit-identical run to run (content-
 * addressable shards; retries and re-stages produce the same file).
 *
 * Scale shape (100 TB): the SHARD is the unit of both write and read
 * parallelism. [[writeShards]] hash-partitions by sample key (a sample
 * never splits across shards) and each task streams its shard to a temp
 * file then atomically renames — a retried task can't leave a torn
 * shard. [[readShards]] rides Spark's binaryFile source (one task per
 * shard, whole-file reads — WebDataset shards are sized 100 MB–1 GB for
 * exactly this) and flatMaps the member walk, so member rows never pass
 * through the driver.
 */
object TarShards {

  private val BlockSize = 512

  /** `width-1` octal digits, zero-padded, NUL-terminated (the ustar
    * numeric-field convention GNU/BSD tar both accept). */
  private def octal(v: Long, width: Int): Array[Byte] = {
    require(v >= 0, s"tar numeric field must be non-negative: $v")
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(US_ASCII)
  }

  /** One ustar header block for a regular file. */
  private[sources] def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(US_ASCII)
    require(nameBytes.length > 0 && nameBytes.length <= 100,
      s"ustar member name must be 1..100 bytes: '$name'")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, nameBytes)
    put(100, octal(420L, 8)) // mode 0644
    put(108, octal(0L, 8)) // uid
    put(116, octal(0L, 8)) // gid
    put(124, octal(size, 12))
    put(136, octal(0L, 12)) // mtime 0: deterministic shard bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces while summing
    h(156) = '0' // regular file
    put(257, "ustar\u0000".getBytes(US_ASCII))
    put(263, "00".getBytes(US_ASCII))
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    val c = java.lang.Long.toOctalString(sum)
    put(148, (("0" * (6 - c.length)) + c + "\u0000 ").getBytes(US_ASCII))
    h
  }

  /** Serialize members as one ustar archive (order preserved). */
  def writeTar(members: Iterator[(String, Array[Byte])], out: OutputStream): Unit = {
    members.foreach { case (name, data) =>
      out.write(header(name, data.length.toLong))
      out.write(data)
      val pad = (BlockSize - (data.length % BlockSize)) % BlockSize
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize))
  }

  /** Walk an archive: (memberName, bytes) in archive order. Verifies
    * each header checksum (a torn or bit-flipped shard fails LOUDLY, not
    * as silently truncated members); skips non-regular members (dirs,
    * pax/gnu extension headers) by their declared size; stops at the
    * first zero block. */
  def readTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 0
    def isZeroBlock(p: Int): Boolean = {
      var i = p
      while (i < p + BlockSize && bytes(i) == 0) i += 1
      i == p + BlockSize
    }
    while (pos + BlockSize <= bytes.length && !isZeroBlock(pos)) {
      var nameEnd = pos
      while (nameEnd < pos + 100 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, pos, nameEnd - pos, US_ASCII)
      val sizeStr = new String(bytes, pos + 124, 12, US_ASCII)
        .takeWhile(c => c >= '0' && c <= '7')
      val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
      // recompute the checksum with the chksum field read as spaces
      var sum = 0L
      var i = pos
      while (i < pos + BlockSize) {
        sum += (if (i >= pos + 148 && i < pos + 156) ' '.toInt else bytes(i) & 0xff)
        i += 1
      }
      val storedStr = new String(bytes, pos + 148, 8, US_ASCII)
        .takeWhile(c => c >= '0' && c <= '7')
      val stored = if (storedStr.isEmpty) -1L else java.lang.Long.parseLong(storedStr, 8)
      require(stored == sum,
        s"tar header checksum mismatch at offset $pos for '$name' " +
          s"(stored $stored, computed $sum) — torn or corrupted shard")
      val typeflag = bytes(pos + 156)
      pos += BlockSize
      val dataBlocks = ((size + BlockSize - 1) / BlockSize).toInt
      if (typeflag == '0'.toByte || typeflag == 0.toByte) {
        require(pos + size <= bytes.length,
          s"tar member '$name' declares $size bytes past the end of the shard")
        out += name -> java.util.Arrays.copyOfRange(bytes, pos, pos + size.toInt)
      }
      pos += dataBlocks * BlockSize
    }
    out.result()
  }

  /** Distributed sink: rows `(key STRING, ext STRING, data BINARY)` →
    * `nShards` archives at `dir/shard-NNNNN.tar`. Hash-partitioned by
    * key (a sample's members land in ONE shard) and sorted within the
    * shard by (key, ext) — the WebDataset contiguity contract. Shards
    * with no rows are simply absent. */
  def writeShards(df: DataFrame, dir: String, nShards: Int): Unit = {
    require(nShards >= 1, "at least one shard")
    Files.createDirectories(Paths.get(dir))
    df.select(col("key").cast("string"), col("ext").cast("string"), col("data"))
      .repartition(nShards, col("key"))
      .sortWithinPartitions(col("key"), col("ext"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val target = Paths.get(dir, f"shard-$pid%05d.tar")
          val tmp = Files.createTempFile(Paths.get(dir), s".shard-$pid-", ".tmp")
          val os = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
          try writeTar(it.map(r =>
            s"${r.getString(0)}.${r.getString(1)}" -> r.getAs[Array[Byte]](2)), os)
          finally os.close()
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          ()
        }
      }
  }

  /** Distributed source: every `.tar` member under `dir` as a row
    * `(shard, key, ext, data)` — key/ext split at the FIRST dot of the
    * member name (the WebDataset convention: `0001.seg.json` is field
    * `seg.json` of sample `0001`). One binaryFile task per shard. */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter (not a literal glob in the path): skips stray .tmp
    // staging files and the analyzer's noisy literal-path metadata probe
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        readTar(content).iterator.map { case (member, data) =>
          val dot = member.indexOf('.')
          val (key, ext) =
            if (dot < 0) (member, "") else (member.take(dot), member.drop(dot + 1))
          (shard, key, ext, data)
        }
      }
      .toDF("shard", "key", "ext", "data")
  }
}
