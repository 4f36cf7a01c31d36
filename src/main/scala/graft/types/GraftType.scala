package graft.types

import org.apache.spark.sql.types._

/** Hierarchical type system re-expressing bertrand's ScalarType/
  * DecoratorType lattice (reference: bertrand/types/base/meta.py) on top
  * of Spark's Catalyst types.
  *
  * A [[GraftType]] is a canonical, hashable description of a column's
  * logical type: scalar types carry width/signedness/tz parameters;
  * decorator types (`sparse`, `categorical`) wrap another type, mirroring
  * the reference's recursive decorator stack
  * (bertrand/types/sparse.py, bertrand/types/categorical.py).
  */
sealed trait GraftType {
  /** Canonical spec string (round-trips through [[TypeResolver.resolve]]). */
  def spec: String
  /** Closest Spark physical type. */
  def sparkType: DataType
  /** Root family name, mirroring the reference's supertype roots. */
  def family: String
}

sealed trait ScalarGraftType extends GraftType

case object GBoolean extends ScalarGraftType {
  val spec = "bool"; val sparkType = BooleanType; val family = "bool"
}

/** Signed/unsigned fixed-width integers. Spark has no unsigned types, so
  * uintN is carried as the next-wider signed Spark type with a range
  * constraint enforced by the cast kernels (SURVEY §3). */
final case class GInteger(bits: Int, signed: Boolean = true) extends ScalarGraftType {
  val spec = s"${if (signed) "int" else "uint"}$bits"
  val sparkType: DataType = (bits, signed) match {
    case (8, true) => ByteType
    case (16, true) => ShortType
    case (32, true) => IntegerType
    case (64, true) => LongType
    case (8, false) => ShortType
    case (16, false) => IntegerType
    case (32, false) => LongType
    case (64, false) => DecimalType(20, 0)
    case _ => throw new IllegalArgumentException(s"bad int width $bits")
  }
  val family = "int"
  def minValue: BigInt = if (signed) -(BigInt(1) << (bits - 1)) else 0
  def maxValue: BigInt = (if (signed) (BigInt(1) << (bits - 1)) else (BigInt(1) << bits)) - 1
}

final case class GFloat(bits: Int) extends ScalarGraftType {
  val spec = s"float$bits"
  val sparkType: DataType = bits match {
    case 32 => FloatType
    case 64 => DoubleType
    // float16 has no Spark physical type; carried as float32 with
    // precision constraint (reference types/float.py Float16Type).
    case 16 => FloatType
    case _ => throw new IllegalArgumentException(s"bad float width $bits")
  }
  val family = "float"
}

final case class GDecimal(precision: Int = 38, scale: Int = 18) extends ScalarGraftType {
  val spec = s"decimal($precision,$scale)"
  val sparkType = DecimalType(precision, scale)
  val family = "decimal"
}

/** Complex numbers: no Spark physical type; struct<re,im> per SURVEY §3
  * (reference types/complex.py). */
final case class GComplex(bits: Int = 128) extends ScalarGraftType {
  val spec = s"complex$bits"
  val sparkType: DataType =
    StructType(Seq(StructField("re", DoubleType), StructField("im", DoubleType)))
  val family = "complex"
}

final case class GDatetime(tz: Option[String] = None) extends ScalarGraftType {
  val spec = tz.fold("datetime")(z => s"datetime[$z]")
  val sparkType: DataType = TimestampType
  val family = "datetime"
}

/** Timedelta: Spark DayTimeIntervalType is poorly supported in parquet;
  * carried as int64 microseconds (reference types/timedelta.py). */
case object GTimedelta extends ScalarGraftType {
  val spec = "timedelta"; val sparkType: DataType = LongType; val family = "timedelta"
}

case object GString extends ScalarGraftType {
  val spec = "string"; val sparkType = StringType; val family = "string"
}

/** Opaque/object data: binary payload (reference types/object.py). */
case object GObject extends ScalarGraftType {
  val spec = "object"; val sparkType: DataType = BinaryType; val family = "object"
}

/** The missing-value type (reference types/missing.py): a column that is
  * all-null has this type; any type unions with it via nullability. */
case object GMissing extends ScalarGraftType {
  val spec = "missing"; val sparkType: DataType = NullType; val family = "missing"
}

final case class GCategorical(wrapped: GraftType) extends GraftType {
  val spec = s"categorical[${wrapped.spec}]"
  val sparkType: DataType = IntegerType // dictionary code; table carried separately
  val family = wrapped.family
}

final case class GSparse(wrapped: GraftType, fill: Option[String] = None) extends GraftType {
  val spec = fill.fold(s"sparse[${wrapped.spec}]")(f => s"sparse[${wrapped.spec}, $f]")
  val sparkType: DataType = wrapped.sparkType
  val family = wrapped.family
}

/** Union of types (reference UnionMeta, types/base/meta.py:677 —
  * `resolve_type("int64 | float64")`): a column satisfies the union if
  * it satisfies ANY member. Spark carrier is the first member's
  * physical type (unions are a validation/dispatch concept, not a
  * storage one — mixed physical storage goes through `object` or
  * split-apply-combine, SURVEY §3). */
final case class GUnion(members: Seq[GraftType]) extends GraftType {
  require(members.nonEmpty, "empty union")
  val spec: String = members.map(_.spec).mkString(" | ")
  val sparkType: DataType = members.head.sparkType
  val family = "union"
  def admits(t: GraftType): Boolean =
    members.exists(m => m.spec == t.spec || m.family == t.family)
}

/** Structured (named) union (reference UnionMeta `__class_getitem__`,
  * types/base/meta.py:1278 — `resolve("Union[foo: categorical[string],
  * bar: decimal]")` / `resolve("foo: int32 | int64, bar: bool")`): an
  * ordered column-name → type binding used as a whole-DataFrame schema
  * contract. Each field's bound type may itself be a plain union.
  * Spark carrier is the corresponding struct shape. */
final case class GStructUnion(fields: Seq[(String, GraftType)]) extends GraftType {
  require(fields.nonEmpty, "empty structured union")
  val spec: String =
    fields.map { case (n, t) => s"$n: ${t.spec}" }.mkString("Union[", ", ", "]")
  val sparkType: DataType =
    StructType(fields.map { case (n, t) => StructField(n, t.sparkType) })
  val family = "union"
  /** A (name, type) column satisfies the contract iff a field of that
    * name exists and its bound type admits the column's type. */
  def admits(name: String, t: GraftType): Boolean =
    fields.exists { case (n, m) =>
      n == name && (m match {
        case u: GUnion => u.admits(t)
        case other => other.spec == t.spec || other.family == t.family
      })
    }
}

/** A user-defined scalar type (reference: `@register class CustomType`,
  * types/base tutorial — "new types added in as little as 10 lines").
  * Wraps a Spark physical type with a distinct spec name; cast behavior
  * can be attached via [[TypeRegistry.register]]'s caster. */
final case class GCustom(name: String, override val sparkType: DataType,
    override val family: String) extends ScalarGraftType {
  val spec: String = name
}

/** Extensible registry backing [[TypeResolver]]: mirrors the
  * reference's `register`/`aliases.add` machinery
  * (types/base/meta.py registry + alias mutation shown in the README
  * doctest). Registered aliases take effect immediately in
  * `resolve_type` and in `Column.castTo`. */
object TypeRegistry {
  import org.apache.spark.sql.Column

  private val custom = scala.collection.concurrent.TrieMap.empty[String, GraftType]
  private val casters = scala.collection.concurrent.TrieMap.empty[String, Column => Column]

  /** Register a type under one or more aliases, optionally with a cast
    * kernel invoked by `Column.castTo(alias)`. */
  def register(t: GraftType, aliases: Seq[String],
      caster: Option[Column => Column] = None): Unit = {
    aliases.foreach { a =>
      custom.put(a.toLowerCase, t)
      caster.foreach(casters.put(a.toLowerCase, _))
    }
  }

  /** Override the cast kernel of an EXISTING spec — builtin or custom.
    * Mirrors the reference's multi-dispatch precedence
    * (decorators/dispatch.py:2453: a user `@cast.overload` beats the
    * default implementation; most-recent registration wins).
    * `Column.castTo(spec)` consults this registry BEFORE the builtin
    * kernels, so the override takes effect immediately;
    * [[unregister]] restores the builtin. */
  def overrideCast(spec: String, kernel: Column => Column): Unit =
    casters.put(spec.toLowerCase, kernel)

  /** Add an alias to an already-registered spec (reference:
    * `resolve_type("foo").aliases.add("baz")`). */
  def addAlias(existingSpec: String, alias: String): Unit =
    custom.get(existingSpec.toLowerCase)
      .orElse(scala.util.Try(TypeResolver.resolve(existingSpec)).toOption)
      .foreach(t => custom.put(alias.toLowerCase, t))

  def lookup(alias: String): Option[GraftType] = custom.get(alias.toLowerCase)
  def casterFor(alias: String): Option[Column => Column] = casters.get(alias.toLowerCase)
  def unregister(alias: String): Unit = { custom.remove(alias.toLowerCase); casters.remove(alias.toLowerCase) }
}

/** Parser for the type-spec mini-language (reference `resolve_type`,
  * bertrand/types/base/meta.py:1143). Accepts the reference's aliases
  * plus Spark/DuckDB-style names and user-registered aliases
  * ([[TypeRegistry]]); case-insensitive; decorators nest:
  * `sparse[categorical[int64]]`. */
object TypeResolver {

  private val aliases: Map[String, GraftType] = Map(
    "bool" -> GBoolean, "boolean" -> GBoolean, "?" -> GBoolean,
    "int" -> GInteger(64), "integer" -> GInteger(64),
    "i1" -> GInteger(8), "i2" -> GInteger(16), "i4" -> GInteger(32), "i8" -> GInteger(64),
    "int8" -> GInteger(8), "int16" -> GInteger(16), "int32" -> GInteger(32), "int64" -> GInteger(64),
    "byte" -> GInteger(8), "short" -> GInteger(16), "long" -> GInteger(64), "bigint" -> GInteger(64),
    "tinyint" -> GInteger(8), "smallint" -> GInteger(16),
    "uint8" -> GInteger(8, signed = false), "uint16" -> GInteger(16, signed = false),
    "uint32" -> GInteger(32, signed = false), "uint64" -> GInteger(64, signed = false),
    "u1" -> GInteger(8, signed = false), "u2" -> GInteger(16, signed = false),
    "u4" -> GInteger(32, signed = false), "u8" -> GInteger(64, signed = false),
    "float" -> GFloat(64), "double" -> GFloat(64), "f8" -> GFloat(64),
    "float16" -> GFloat(16), "half" -> GFloat(16), "f2" -> GFloat(16),
    "float32" -> GFloat(32), "f4" -> GFloat(32), "float64" -> GFloat(64),
    "decimal" -> GDecimal(), "numeric" -> GDecimal(),
    "complex" -> GComplex(), "complex128" -> GComplex(), "c16" -> GComplex(),
    "complex64" -> GComplex(64), "c8" -> GComplex(64),
    "datetime" -> GDatetime(), "timestamp" -> GDatetime(),
    "timedelta" -> GTimedelta, "duration" -> GTimedelta, "interval" -> GTimedelta,
    "string" -> GString, "str" -> GString, "varchar" -> GString, "text" -> GString,
    "object" -> GObject, "obj" -> GObject, "binary" -> GObject, "bytes" -> GObject,
    "missing" -> GMissing, "na" -> GMissing, "null" -> GMissing, "none" -> GMissing,
  )

  private val decimalRe = """^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$""".r
  private val decoratorRe = """^(sparse|categorical|datetime)\s*\[(.*)\]$""".r

  /** Resolve a type-spec string to its canonical [[GraftType]].
    * Throws IllegalArgumentException on unknown specs (the reference
    * raises on unresolvable specifiers). */
  def resolve(rawSpec: String): GraftType = {
    val s = rawSpec.trim
    // explicit Union[...] wrapper (reference UnionMeta __class_getitem__,
    // meta.py:9382): members are comma-separated, optionally named
    if (s.toLowerCase.startsWith("union[") && s.endsWith("]"))
      return resolveUnionBody(s.substring(s.indexOf('[') + 1, s.length - 1))
    // top-level commas: "a, b" is a union; "foo: a, bar: b" a structured
    // union (reference: resolve("foo: int32 | int64, bar: bool"))
    val commaParts = splitTop(s, ',')
    if (commaParts.length > 1 || commaParts.exists(hasTopColon))
      return resolveUnionBody(s)
    // top-level pipe unions: "int64 | float64" (reference UnionMeta)
    val parts = splitTop(s, '|')
    if (parts.length > 1) return flatUnion(parts)
    val lower = s.toLowerCase
    aliases.get(lower).orElse(TypeRegistry.lookup(lower)).getOrElse {
      // decorator payloads (tz names, fill values) keep their case: match
      // the lowered form but recurse/capture on the original string
      val inner: String =
        if (lower.matches(decoratorRe.regex) || lower.matches(decimalRe.regex))
          s.substring(s.indexWhere(c => c == '[' || c == '(') + 1, s.length - 1)
        else ""
      lower match {
        case decimalRe(p, sc) => GDecimal(p.toInt, sc.toInt)
        case decoratorRe(dec, _) =>
          dec match {
            case "sparse" =>
              // sparse[T] or sparse[T, fill] — fill kept verbatim
              splitTop(inner) match {
                case Seq(t) => GSparse(resolve(t))
                case Seq(t, f) => GSparse(resolve(t), Some(f.trim))
                case _ => throw new IllegalArgumentException(s"bad sparse spec: $rawSpec")
              }
            case "categorical" => GCategorical(resolve(inner))
            case "datetime" => GDatetime(Some(inner.trim))
          }
        case _ => throw new IllegalArgumentException(s"unresolvable type spec: $rawSpec")
      }
    }
  }

  /** Union body: comma-separated members, each optionally `name: spec`
    * (structured). Mixed named/unnamed is rejected like the reference;
    * nested unnamed unions flatten (reference: "any nested unions will
    * be flattened"), while a named field keeps its bound union whole
    * (`Union[foo: int32 | int64, ...]`). */
  private def resolveUnionBody(body: String): GraftType = {
    val members = splitTop(body, ',')
    if (members.isEmpty)
      throw new IllegalArgumentException(s"empty union spec: $body")
    val named = members.count(hasTopColon)
    if (named > 0 && named < members.length)
      throw new IllegalArgumentException(
        s"union mixes named and unnamed members: $body")
    if (named == 0) {
      val t = flatUnion(members)
      // single unnamed member inside Union[...] still canonicalizes to
      // the member itself (a 1-union IS its member, reference semantics)
      t
    } else
      GStructUnion(members.map { m =>
        val i = topColonIndex(m)
        val name = m.substring(0, i).trim.stripPrefix("'").stripSuffix("'")
        if (name.isEmpty)
          throw new IllegalArgumentException(s"empty field name in: $m")
        name -> resolve(m.substring(i + 1))
      })
  }

  /** Pipe/comma members → flattened unnamed union (1 member = itself). */
  private def flatUnion(parts: Seq[String]): GraftType = {
    val ms = parts.map(resolve).flatMap {
      case GUnion(inner) => inner
      case t => Seq(t)
    }
    if (ms.length == 1) ms.head else GUnion(ms)
  }

  private def topColonIndex(s: String): Int = {
    var depth = 0; var i = 0; var found = -1
    while (i < s.length && found < 0) {
      s.charAt(i) match {
        case '[' | '(' => depth += 1
        case ']' | ')' => depth -= 1
        case ':' if depth == 0 => found = i
        case _ =>
      }
      i += 1
    }
    found
  }

  private def hasTopColon(s: String): Boolean = topColonIndex(s) >= 0

  /** Split on a top-level separator only (nested brackets/parens stay
    * intact — `decimal(10,2)` survives a comma split). */
  private def splitTop(s: String, sep: Char = ','): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '[' => depth += 1; cur += '['
      case ']' => depth -= 1; cur += ']'
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case c if c == sep && depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** GraftType for a Spark physical type (schema-level detection). */
  def fromSpark(dt: DataType): GraftType = dt match {
    case BooleanType => GBoolean
    case ByteType => GInteger(8)
    case ShortType => GInteger(16)
    case IntegerType => GInteger(32)
    case LongType => GInteger(64)
    case FloatType => GFloat(32)
    case DoubleType => GFloat(64)
    case d: DecimalType => GDecimal(d.precision, d.scale)
    case TimestampType | TimestampNTZType | DateType => GDatetime()
    case _: DayTimeIntervalType => GTimedelta
    case StringType => GString
    case BinaryType => GObject
    case NullType => GMissing
    case _ => GObject
  }
}
