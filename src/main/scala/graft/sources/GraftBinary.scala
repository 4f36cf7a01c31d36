package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.JavaConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  // ---- writer (driver-side; dim-scale tables and test fixtures — a
  // distributed DSv2 write path would mirror this per partition) ------
  def write(df: DataFrame, dir: String, filesBy: String): Unit = {
    val schema = df.schema
    require(schema.fields.forall(f => f.dataType match {
      case LongType | DoubleType | StringType => true; case _ => false
    }), "graftbin supports long/double/string")
    val d = new File(dir)
    d.mkdirs()
    d.listFiles().filter(_.getName.endsWith(".gbn")).foreach(_.delete())
    val byKey = df.collect().groupBy(r =>
      r.get(schema.fieldIndex(filesBy)).toString)
    byKey.foreach { case (k, rows) =>
      val out = new DataOutputStream(new FileOutputStream(
        new File(d, s"part-$k.gbn")))
      try {
        out.writeBytes("GBN1")
        out.writeInt(schema.length)
        schema.fields.foreach { f =>
          out.writeUTF(f.name)
          out.writeByte(f.dataType match {
            case LongType => 0; case DoubleType => 1; case StringType => 2
          })
        }
        out.writeLong(rows.length.toLong)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (f.dataType == LongType) {
            val vs = rows.map(_.getLong(i))
            out.writeLong(if (vs.isEmpty) Long.MaxValue else vs.min)
            out.writeLong(if (vs.isEmpty) Long.MinValue else vs.max)
          }
        }
        rows.foreach { r =>
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            f.dataType match {
              case LongType => out.writeLong(r.getLong(i))
              case DoubleType => out.writeDouble(r.getDouble(i))
              case StringType => out.writeUTF(r.getString(i))
            }
          }
        }
      } finally out.close()
    }
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
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftBinaryTable(schema, properties.get("path"))
}

object GraftBinaryTable {
  def files(dir: String): Seq[File] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".gbn")).sortBy(_.getName).toSeq
  }
}

class GraftBinaryTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graftbin:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftBinaryScanBuilder(schema, path)
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
