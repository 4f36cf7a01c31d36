package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream, RandomAccessFile}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.JavaConverters._
import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** "graftbin" — a minimal columnar-stats binary row format plus its
  * full DataSource V2 reader: schema inference from the file header,
  * COLUMN PRUNING (only requested columns are materialized), and
  * footer-stats FILE SKIPPING for long-column range/equality filters
  * (the parquet row-group-skip idea at file granularity). One
  * InputPartition per file — Spark parallelizes across files and
  * co-locates nothing, exactly like any splittable-by-file source.
  *
  * File layout (all big-endian via DataOutputStream):
  *   magic "GBN1" | nCols | per col: (name UTF, type byte 0=long
  *   1=double 2=string) | nRows | per long col: (min, max) | row-major
  *   values (strings as UTF).
  *
  * Filters are used ONLY to skip whole files and are also returned as
  * residuals, so Spark re-evaluates them — skipping can never change
  * results, only work. `filesOpened` instruments the skip for specs.
  */
object GraftBinary {

  val filesOpened = new AtomicLong(0)

  // ---- writer (distributed DSv2 BatchWrite; see GraftBinaryWrite) ----
  /** Write `df` as one .gbn file per distinct `filesBy` value, through
    * the executor-side DSv2 write path: the key repartition co-locates
    * each key's rows in one task, the within-partition sort lets each
    * task stream keys with ONE open file at a time (the sorted
    * dynamic-partition writer idea), and commit is an atomic
    * temp-rename fan-in on the driver. No row ever visits the driver. */
  def write(df: DataFrame, dir: String, filesBy: String): Unit = {
    val schema = df.schema
    require(schema.fields.forall(f => f.dataType match {
      case LongType | DoubleType | StringType => true; case _ => false
    }), "graftbin supports long/double/string")
    require(schema.fieldNames.contains(filesBy), s"no such column: $filesBy")
    df.repartition(col(filesBy)).sortWithinPartitions(col(filesBy))
      .write.format("graft.sources.GraftBinarySource")
      .option("path", dir).option("filesBy", filesBy)
      .mode("overwrite").save()
  }

  private[sources] def typeByte(dt: DataType): Int = dt match {
    case LongType => 0; case DoubleType => 1; case StringType => 2
    case other => throw new IllegalArgumentException(
      s"graftbin supports long/double/string, got $other")
  }

  // ---- header/stats parsing -------------------------------------------
  private[sources] final case class Header(schema: StructType,
      nRows: Long, longStats: Map[String, (Long, Long)], dataOffset: Long)

  private[sources] def readHeader(in: DataInputStream): Header = {
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GBN1", "not a graftbin file")
    var off = 4L
    val n = in.readInt(); off += 4
    val fields = (0 until n).map { _ =>
      val name = in.readUTF()
      off += 2 + name.getBytes("UTF-8").length
      val t = in.readByte(); off += 1
      StructField(name, t match {
        case 0 => LongType; case 1 => DoubleType; case _ => StringType
      })
    }
    val nRows = in.readLong(); off += 8
    val stats = fields.filter(_.dataType == LongType).map { f =>
      val mn = in.readLong(); val mx = in.readLong(); off += 16
      f.name -> (mn, mx)
    }.toMap
    Header(StructType(fields), nRows, stats, off)
  }

  private[sources] def mayMatch(stats: Map[String, (Long, Long)],
      f: Filter): Boolean = f match {
    case EqualTo(c, v: Long) => stats.get(c).forall {
      case (mn, mx) => v >= mn && v <= mx }
    case GreaterThan(c, v: Long) => stats.get(c).forall(_._2 > v)
    case GreaterThanOrEqual(c, v: Long) => stats.get(c).forall(_._2 >= v)
    case LessThan(c, v: Long) => stats.get(c).forall(_._1 < v)
    case LessThanOrEqual(c, v: Long) => stats.get(c).forall(_._1 <= v)
    case _ => true // unknown shape: never skip on it
  }
}

/** `spark.read.format("graft.sources.GraftBinarySource")` entry. */
class GraftBinarySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val first = GraftBinaryTable.files(options.get("path")).headOption
      .getOrElse(throw new IllegalArgumentException("no .gbn files"))
    val in = new DataInputStream(new FileInputStream(first))
    try GraftBinary.readHeader(in).schema finally in.close()
  }
  // writes to a fresh directory carry the dataframe's schema — don't
  // force an inferSchema over files that don't exist yet
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftBinaryTable(schema, properties.get("path"),
      Option(properties.get("filesBy")))
}

object GraftBinaryTable {
  def files(dir: String): Seq[File] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".gbn")).sortBy(_.getName).toSeq
  }
}

class GraftBinaryTable(schema: StructType, path: String,
    filesBy: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftbin:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftBinaryScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftBinaryWriteBuilder(info.schema(), path,
      Option(info.options.get("filesBy")).orElse(filesBy))
}

class GraftBinaryScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  private var filters: Array[Filter] = Array.empty

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all residual: skipping is an optimization, never a contract
  }
  override def pushedFilters(): Array[Filter] = filters
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve file column order; Spark may reorder the projection
    val want = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => want(f.name)))
  }
  override def build(): Scan =
    new GraftBinaryScan(fullSchema, required, filters, path)
}

class GraftBinaryScan(fullSchema: StructType, required: StructType,
    filters: Array[Filter], path: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graftbin path=$path, pruned=${required.fieldNames.mkString(",")}, " +
      s"skipFilters=${filters.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    GraftBinaryTable.files(path).filter { f =>
      // footer-stats skip: open header only, drop disjoint files
      val in = new DataInputStream(new FileInputStream(f))
      val h = try GraftBinary.readHeader(in) finally in.close()
      filters.forall(GraftBinary.mayMatch(h.longStats, _))
    }.map(f => GraftBinaryPartition(f.getAbsolutePath): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBinaryReaderFactory(fullSchema, required)
}

final case class GraftBinaryPartition(file: String) extends InputPartition

class GraftBinaryReaderFactory(fullSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftBinaryReader(p.asInstanceOf[GraftBinaryPartition].file,
      fullSchema, required)
}

/** Sequential row reader: every column is decoded positionally, but
  * only required columns materialize into the output row. */
class GraftBinaryReader(file: String, fullSchema: StructType,
    required: StructType) extends PartitionReader[InternalRow] {
  GraftBinary.filesOpened.incrementAndGet()
  private val in = new DataInputStream(new FileInputStream(file))
  private val header = GraftBinary.readHeader(in)
  private val keep: Array[Int] = { // output slot per file column, -1 = skip
    val slots = required.fieldNames.zipWithIndex.toMap
    header.schema.fieldNames.map(n => slots.getOrElse(n, -1))
  }
  private var read = 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (read >= header.nRows) return false
    val out = new Array[Any](required.length)
    header.schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: Any = f.dataType match {
        case LongType => in.readLong()
        case DoubleType => in.readDouble()
        case StringType => UTF8String.fromString(in.readUTF())
      }
      if (keep(i) >= 0) out(keep(i)) = v
    }
    row = InternalRow.fromSeq(out.toIndexedSeq)
    read += 1
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------------
// Distributed write path (DSv2 BatchWrite)
// ---------------------------------------------------------------------------

/** Truncate-capable write builder: `mode("overwrite")` replaces the
  * directory's .gbn set atomically at commit. */
class GraftBinaryWriteBuilder(schema: StructType, path: String,
    filesBy: Option[String]) extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBinaryBatchWrite(schema, path, filesBy, overwrite)
  }
}

/** Executor-parallel write: each task streams its partition's rows
  * straight to temp .gbn files (never buffering rows, never visiting
  * the driver); the driver's commit() is a pure metadata fan-in —
  * delete-on-truncate plus one rename per produced file. Task retries
  * are safe: temps carry the task id, only committed temps rename.
  *
  * File granularity: with `filesBy` set, one file per distinct key —
  * callers must key-repartition + sort (GraftBinary.write does), so a
  * task holds each of its keys contiguously and keeps ONE open file
  * at a time, like Spark's sorted dynamic-partition writer. Without
  * `filesBy`, one file per partition. */
class GraftBinaryBatchWrite(schema: StructType, path: String,
    filesBy: Option[String], overwrite: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new GraftBinaryWriterFactory(schema, path, filesBy)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val renames = messages.flatMap {
      case GraftBinCommit(pairs) => pairs
    }
    val dup = renames.groupBy(_._2).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"graftbin write produced duplicate files ${dup.mkString(",")} — " +
        "filesBy keys must be co-located (repartition by the key first)")
    if (overwrite)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".gbn")).foreach(_.delete())
    renames.foreach { case (tmp, fin) =>
      val t = new File(tmp); val f = new File(dir, fin)
      if (f.exists()) f.delete()
      require(t.renameTo(f), s"rename failed: $tmp -> $f")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftBinCommit(pairs) =>
        pairs.foreach { case (tmp, _) => new File(tmp).delete() }
      case _ =>
    }
}

final case class GraftBinCommit(pairs: Seq[(String, String)])
    extends WriterCommitMessage

class GraftBinaryWriterFactory(schema: StructType, path: String,
    filesBy: Option[String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftBinaryWriter(schema, path, filesBy, partitionId, taskId)
}

/** Streams rows to .gbn temps with O(1) memory: the header is written
  * with placeholder nRows/stats, rows append behind it, and close()
  * patches the fixed-offset header fields in place (RandomAccessFile)
  * — row count and per-long-column (min, max) footer stats that the
  * read side's file-skip uses. */
class GraftBinaryWriter(schema: StructType, path: String,
    filesBy: Option[String], partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val keyIdx = filesBy.map(schema.fieldIndex)
  private val longCols = schema.fields.zipWithIndex
    .filter(_._1.dataType == LongType).map(_._2)
  // header layout offsets (fixed once the schema is known)
  private val nRowsOffset: Long = {
    var off = 4L + 4L
    schema.fields.foreach { f =>
      off += 2 + f.name.getBytes("UTF-8").length + 1
    }
    off
  }

  private final class OpenFile(val tmp: File, val finalName: String) {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(tmp)))
    var nRows = 0L
    val mins = Array.fill(longCols.length)(Long.MaxValue)
    val maxs = Array.fill(longCols.length)(Long.MinValue)
    // placeholder header; nRows/stats patched on close
    out.writeBytes("GBN1")
    out.writeInt(schema.length)
    schema.fields.foreach { f =>
      out.writeUTF(f.name)
      out.writeByte(GraftBinary.typeByte(f.dataType))
    }
    out.writeLong(0L)
    longCols.foreach { _ => out.writeLong(Long.MaxValue); out.writeLong(Long.MinValue) }
    def closePatched(): Unit = {
      out.close()
      val raf = new RandomAccessFile(tmp, "rw")
      try {
        raf.seek(nRowsOffset)
        raf.writeLong(nRows)
        var i = 0
        while (i < longCols.length) {
          raf.writeLong(mins(i)); raf.writeLong(maxs(i)); i += 1
        }
      } finally raf.close()
    }
  }

  private var cur: OpenFile = _
  private var curKey: String = _
  private val done = mutable.ArrayBuffer.empty[OpenFile]
  private val seenKeys = mutable.Set.empty[String]

  private def roll(key: String): Unit = {
    if (cur != null) { cur.closePatched(); done += cur }
    require(seenKeys.add(key),
      s"filesBy key '$key' reappeared out of order in partition " +
        s"$partitionId — sortWithinPartitions the key before writing")
    val finalName =
      if (filesBy.isDefined) s"part-$key.gbn" else s"part-$partitionId.gbn"
    cur = new OpenFile(
      new File(path, s".$finalName.$taskId.inprogress"), finalName)
    curKey = key
  }

  override def write(row: InternalRow): Unit = {
    val key = keyIdx.map { i =>
      schema.fields(i).dataType match {
        case StringType => row.getUTF8String(i).toString
        case LongType => row.getLong(i).toString
        case _ => row.getDouble(i).toString
      }
    }.getOrElse("")
    if (cur == null || key != curKey) roll(key)
    cur.nRows += 1
    var li = 0
    var i = 0
    while (i < schema.length) {
      schema.fields(i).dataType match {
        case LongType =>
          val v = row.getLong(i)
          cur.out.writeLong(v)
          if (v < cur.mins(li)) cur.mins(li) = v
          if (v > cur.maxs(li)) cur.maxs(li) = v
          li += 1
        case DoubleType => cur.out.writeDouble(row.getDouble(i))
        case StringType => cur.out.writeUTF(row.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(s"bad type $other")
      }
      i += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    if (cur != null) { cur.closePatched(); done += cur }
    cur = null
    GraftBinCommit(done.map(o =>
      o.tmp.getAbsolutePath -> o.finalName).toSeq)
  }

  override def abort(): Unit = {
    if (cur != null) { cur.out.close(); done += cur }
    done.foreach(_.tmp.delete())
  }

  override def close(): Unit =
    if (cur != null) { cur.out.close(); cur = null }
}
