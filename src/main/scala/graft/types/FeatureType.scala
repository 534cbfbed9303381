package graft.types

import org.apache.spark.sql.types._

/**
 * Feature type system — string dtype grammar, Spark mapping, compatibility
 * and binary-op result inference, mirroring the reference semantics
 * (raise_/models/types.py: patterns :276-292, parse :295-330,
 * compatibility per-type `is_compatible`, inference :333-365) on Spark's
 * type lattice.
 */
sealed trait FeatureType {
  def sparkType: DataType
  def typeString: String
  /** May data of `other` be written into a column declared as `this`? */
  def isCompatible(other: FeatureType): Boolean = this == other
}

case object TInt64 extends FeatureType {
  val sparkType = LongType; val typeString = "int64"
  override def isCompatible(o: FeatureType): Boolean = o == TInt64
}
case object TFloat32 extends FeatureType {
  val sparkType = FloatType; val typeString = "float32"
  // numeric-compat: ints may be written into float columns (types.py:43-44)
  override def isCompatible(o: FeatureType): Boolean =
    o == TFloat32 || o == TInt64
}
case object TFloat64 extends FeatureType {
  val sparkType = DoubleType; val typeString = "float64"
  override def isCompatible(o: FeatureType): Boolean =
    o == TFloat64 || o == TFloat32 || o == TInt64
}
case object TBool extends FeatureType {
  val sparkType = BooleanType; val typeString = "bool"
}
final case class TString(maxLength: Option[Int] = None) extends FeatureType {
  val sparkType: DataType = StringType
  def typeString: String = maxLength.fold("string")(n => s"string[$n]")
  // other fits if its bound is no larger (types.py:91-98)
  override def isCompatible(o: FeatureType): Boolean = o match {
    case TString(om) => maxLength.forall(m => om.exists(_ <= m))
    case _           => false
  }
}
case object TBytes extends FeatureType {
  val sparkType = BinaryType; val typeString = "bytes"
}
case object TTimestamp extends FeatureType {
  val sparkType = TimestampType; val typeString = "timestamp"
}
/** Fixed-dimension embedding; float16 stored as float32 (no half type). */
final case class TEmbedding(dtype: String, dim: Int) extends FeatureType {
  require(dim > 0, "Embedding dimension must be positive")
  require(Set("float16", "float32", "float64")(dtype), s"Bad embedding dtype: $dtype")
  val sparkType: DataType = ArrayType(
    if (dtype == "float64") DoubleType else FloatType, containsNull = false)
  def typeString = s"$dtype[$dim]"
  // equal dim AND dtype required (types.py:145-148)
  override def isCompatible(o: FeatureType): Boolean = o == this
}
final case class TArray(element: FeatureType, maxLength: Option[Int] = None)
    extends FeatureType {
  val sparkType: DataType = ArrayType(element.sparkType)
  def typeString: String =
    maxLength.fold(s"${element.typeString}[]")(n => s"${element.typeString}[:$n]")
  override def isCompatible(o: FeatureType): Boolean = o match {
    case TArray(e, om) =>
      element.isCompatible(e) && maxLength.forall(m => om.exists(_ <= m))
    case _ => false
  }
}
final case class TStruct(fields: Seq[(String, FeatureType)]) extends FeatureType {
  val sparkType: DataType =
    StructType(fields.map { case (n, t) => StructField(n, t.sparkType) })
  def typeString: String =
    fields.map { case (n, t) => s"$n: ${t.typeString}" }
      .mkString("struct<", ", ", ">")
  // recursive field-wise compat, same field set (types.py:205-212)
  override def isCompatible(o: FeatureType): Boolean = o match {
    case TStruct(of) =>
      fields.size == of.size && fields.zip(of).forall {
        case ((n1, t1), (n2, t2)) => n1 == n2 && t1.isCompatible(t2)
      }
    case _ => false
  }
}
/** Blob reference; optional allowed content-type list (types.py:215-272). */
final case class TBlobRef(contentTypes: Seq[String] = Nil) extends FeatureType {
  val sparkType: DataType = graft.ops.Multimodal.blobRefType
  def typeString: String =
    if (contentTypes.isEmpty) "blob_ref"
    else s"blob_ref<${contentTypes.mkString("|")}>"
  /** subset-compat: other's allowed types ⊆ ours; unconstrained accepts all. */
  override def isCompatible(o: FeatureType): Boolean = o match {
    case TBlobRef(ct) =>
      contentTypes.isEmpty || ct.nonEmpty && ct.forall(accepts)
    case _ => false
  }
  /** write-time content-type check, with "type/-star" wildcards. */
  def accepts(contentType: String): Boolean =
    contentTypes.isEmpty || contentTypes.exists { allowed =>
      allowed == contentType ||
      (allowed.endsWith("/*") &&
        contentType.startsWith(allowed.dropRight(1)))
    }
}

object FeatureType {

  private val EmbeddingRe = "^(float16|float32|float64)\\[(\\d+)\\]$".r
  private val ArrayBoundedRe = "^(.+)\\[:(\\d+)\\]$".r
  private val ArrayRe = "^(.+)\\[\\]$".r
  private val StringBoundedRe = "^string\\[(\\d+)\\]$".r
  private val StructRe = "^struct<(.*)>$".r
  private val BlobRe = "^blob_ref(?:<(.+)>)?$".r

  /** Parse the string dtype grammar (types.py:295-330). */
  def parse(s: String): FeatureType = s.trim match {
    case "int64"                 => TInt64
    case "float32"               => TFloat32
    case "float64"               => TFloat64
    case "bool"                  => TBool
    case "string"                => TString(None)
    case "bytes"                 => TBytes
    case "timestamp"             => TTimestamp
    case StringBoundedRe(n)      => TString(Some(n.toInt))
    case EmbeddingRe(dt, dim)    => TEmbedding(dt, dim.toInt)
    case ArrayBoundedRe(el, n)   => TArray(parse(el), Some(n.toInt))
    case ArrayRe(el)             => TArray(parse(el), None)
    case BlobRe(null)            => TBlobRef(Nil)
    case BlobRe(cts)             => TBlobRef(cts.split("\\|").map(_.trim).toSeq)
    case StructRe(body)          => TStruct(parseStructFields(body))
    case other =>
      throw new IllegalArgumentException(s"Unknown dtype: $other")
  }

  /** split struct body on top-level commas (nesting-aware). */
  private def parseStructFields(body: String): Seq[(String, FeatureType)] = {
    if (body.trim.isEmpty) return Nil
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case c @ ('<' | '[') => depth += 1; cur += c
      case c @ ('>' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 => parts += cur.result(); cur.clear()
      case c => cur += c
    }
    parts += cur.result()
    parts.map { p =>
      val i = p.indexOf(':')
      require(i > 0, s"Bad struct field: $p")
      (p.take(i).trim, parse(p.drop(i + 1)))
    }.toSeq
  }

  /** Map a Spark type back to the dtype grammar (best-effort). */
  def fromSpark(dt: DataType): FeatureType = dt match {
    case LongType | IntegerType | ShortType | ByteType => TInt64
    case FloatType     => TFloat32
    case DoubleType    => TFloat64
    case BooleanType   => TBool
    case StringType    => TString(None)
    case BinaryType    => TBytes
    case TimestampType => TTimestamp
    case ArrayType(FloatType, false)  => TArray(TFloat32)
    case ArrayType(e, _) => TArray(fromSpark(e))
    case st: StructType =>
      TStruct(st.fields.toSeq.map(f => f.name -> fromSpark(f.dataType)))
    case other =>
      throw new IllegalArgumentException(s"No feature type for Spark $other")
  }

  /**
   * Result-type inference for binary ops (types.py:333-365):
   * comparisons/logic → bool; `||` → string; `/` → float64; otherwise
   * numeric promotion int64 < float32 < float64.
   */
  def inferResultType(left: FeatureType, op: String, right: FeatureType): FeatureType =
    op match {
      case "=" | "==" | "!=" | "<" | ">" | "<=" | ">=" | "and" | "or" |
          "AND" | "OR" => TBool
      case "||" => TString(None)
      case "/"  => TFloat64
      case "+" | "-" | "*" | "%" =>
        (left, right) match {
          case (TFloat64, _) | (_, TFloat64) => TFloat64
          case (TFloat32, _) | (_, TFloat32) => TFloat32
          case (TInt64, TInt64)              => TInt64
          case _ =>
            throw new IllegalArgumentException(
              s"Non-numeric operands: ${left.typeString} $op ${right.typeString}")
        }
      case other =>
        throw new IllegalArgumentException(s"Unknown operator: $other")
    }
}
