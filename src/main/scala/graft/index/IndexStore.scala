package graft.index

import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.core.{IndexMeta, SegmentMeta, SegmentState, VectorRecord}

/** One PQ code per vector (reference: vectorsearch.proto keyspace
  * `(seg,"pq","codes",vecId)`, written at SegmentBuildService.java:301-302). */
final case class CodeRow(segId: Int, vecId: Int, code: Array[Byte])

/** Segment-local adjacency list (reference: vectorsearch.proto:150-155). */
final case class GraphRow(segId: Int, vecId: Int, neighbors: Array[Int])

/** Per-segment PQ codebook, centroids flattened [m][k][subDim]
  * (reference: vectorsearch.proto:135-142). */
final case class CodebookRow(segId: Int, m: Int, k: Int, subDim: Int, centroids: Array[Float])

/** Index manifest: IndexMeta + segment registry + id high-water marks.
  * Plays the role of FDB's transactional metadata (reference:
  * FdbVectorStore.java:71-122 createOrOpenIndex, segmentsIndex registry at
  * :116,534, nextGid counter at :575-580). A single JSON file committed by
  * write-temp-then-atomic-rename is the engine's unit of metadata
  * atomicity (SURVEY.md §7.4 item 3). */
final case class Manifest(
    meta: IndexMeta,
    segments: List[SegmentMeta],
    nextGid: Long,
    nextSegId: Int,
    /** Highest streaming micro-batch id already ingested (None = no
      * streaming history; Option so manifests written before this field
      * deserialize cleanly; contentAs because Jackson erases Option[Long]
      * to boxed Integer otherwise). Used by Streaming.continuousIngest to
      * make batch replays after failure idempotent. */
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(contentAs = classOf[java.lang.Long])
    lastStreamBatchId: Option[Long] = None) {
  def segment(segId: Int): Option[SegmentMeta] = segments.find(_.segId == segId)
  def active: Option[SegmentMeta] = segments.find(_.state == SegmentState.Active)
  def withSegment(sm: SegmentMeta): Manifest =
    copy(segments = segments.filterNot(_.segId == sm.segId) :+ sm)
}

/**
 * On-disk layout of one index (SURVEY.md §1.1):
 *
 * {{{
 *   <path>/manifest.json            — Manifest (atomic rename commit)
 *   <path>/vectors/segId=N/   (parquet)
 *   <path>/codes/segId=N/     (parquet)
 *   <path>/graph/segId=N/     (parquet)
 *   <path>/codebooks/segId=N/ (parquet)
 * }}}
 *
 * `segId` partitioning gives partition pruning for per-segment scans (the
 * Spark analog of the reference's per-segment key subspaces,
 * FdbDirectories.java:291-308). At cluster scale the same layout works on
 * any Hadoop-compatible FS; local tests use file://.
 */
final class IndexStore(val path: String) {

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def manifestPath: String = s"$path/manifest.json"
  def vectorsDir: String = s"$path/vectors"
  def codesDir: String = s"$path/codes"
  def graphDir: String = s"$path/graph"
  def codebooksDir: String = s"$path/codebooks"

  def exists: Boolean = Files.exists(Paths.get(manifestPath))

  def readManifest(): Manifest =
    mapper.readValue(Files.readAllBytes(Paths.get(manifestPath)), classOf[Manifest])

  /** One read, both views: the parsed manifest and its content hash come
    * from the SAME bytes, so a consumer that keys a cache on the version
    * can never pair it with a manifest from a different commit (a second
    * read racing a concurrent seal/vacuum would). */
  def readManifestWithVersion(): (Manifest, String) = {
    val bytes = Files.readAllBytes(Paths.get(manifestPath))
    (mapper.readValue(bytes, classOf[Manifest]), hashBytes(bytes))
  }

  private def hashBytes(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** Commit the manifest atomically: temp file + rename. */
  def writeManifest(m: Manifest): Unit = {
    Files.createDirectories(Paths.get(path))
    val tmp = Paths.get(s"$manifestPath.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    Files.move(tmp, Paths.get(manifestPath),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create a new index, or open an existing one validating that the stored
    * IndexMeta matches the requested config exactly — mismatches throw
    * (reference: FdbVectorStore.java:124-166 validateIndexMeta). */
  def createOrOpen(meta: IndexMeta, nowMs: Long): Manifest = {
    if (exists) {
      val m = readManifest()
      if (m.meta != meta)
        throw new IllegalStateException(
          s"index config mismatch: stored=${m.meta} requested=$meta")
      m
    } else {
      val first = SegmentMeta(0, SegmentState.Active, 0L, 0L, nowMs)
      val m = Manifest(meta, List(first), nextGid = 0L, nextSegId = 1)
      writeManifest(m)
      m
    }
  }

  // --- table I/O -----------------------------------------------------------

  def readVectors(spark: SparkSession): Dataset[VectorRecord] = {
    import spark.implicits._
    if (!Files.exists(Paths.get(vectorsDir))) spark.emptyDataset[VectorRecord]
    else
      spark.read
        .schema(spark.emptyDataset[VectorRecord].schema)
        .option("basePath", vectorsDir)
        .parquet(vectorsDir)
        .as[VectorRecord]
  }

  def readCodes(spark: SparkSession): Dataset[CodeRow] = {
    import spark.implicits._
    if (!Files.exists(Paths.get(codesDir))) spark.emptyDataset[CodeRow]
    else spark.read.schema(spark.emptyDataset[CodeRow].schema)
      .option("basePath", codesDir).parquet(codesDir).as[CodeRow]
  }

  def readGraph(spark: SparkSession): Dataset[GraphRow] = {
    import spark.implicits._
    if (!Files.exists(Paths.get(graphDir))) spark.emptyDataset[GraphRow]
    else spark.read.schema(spark.emptyDataset[GraphRow].schema)
      .option("basePath", graphDir).parquet(graphDir).as[GraphRow]
  }

  def readCodebooks(spark: SparkSession): Dataset[CodebookRow] = {
    import spark.implicits._
    if (!Files.exists(Paths.get(codebooksDir))) spark.emptyDataset[CodebookRow]
    else spark.read.schema(spark.emptyDataset[CodebookRow].schema)
      .option("basePath", codebooksDir).parquet(codebooksDir).as[CodebookRow]
  }

  /** Append vector rows partitioned by segId (dynamic partition append —
    * only the touched segment dirs gain files). */
  def appendVectors(ds: Dataset[VectorRecord]): Unit =
    ds.write.mode(SaveMode.Append).partitionBy("segId").parquet(vectorsDir)

  /** Overwrite exactly the given segment partitions of the vectors table
    * (dynamic partition overwrite — used by delete/vacuum/compaction). */
  def overwriteVectorSegments(ds: Dataset[VectorRecord]): Unit =
    ds.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segId").parquet(vectorsDir)

  def writeCodes(ds: Dataset[CodeRow]): Unit =
    ds.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segId").parquet(codesDir)

  def writeGraph(ds: Dataset[GraphRow]): Unit =
    ds.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segId").parquet(graphDir)

  def writeCodebooks(ds: Dataset[CodebookRow]): Unit =
    ds.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("segId").parquet(codebooksDir)
}
