package graft.api

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** DataFrame literal constructor mirroring the reference's `toDf` macro
  * (`dataframe.nim:559-639`): named sequences become columns, scalars
  * broadcast to constant columns (the reference's `colConstant`,
  * `column.nim:393-399` — here Catalyst constant folding does the same
  * job), ragged columns are null-filled (`extendShortColumns`,
  * `dataframe.nim:409-419`), and each column's type follows the
  * reference's promotion lattice (`combinedColKind`, `column.nim:507-522`:
  * identical -> itself, {int,float} -> float, anything else -> the
  * object/string fallback).
  *
  * Usage: `toDf(spark)("x" -> Seq(1, 2, 3), "y" -> Seq("a", "b"), "c" -> 5)`
  *
  * Driver-side by design: this is the literal constructor for tests and
  * small frames, exactly like the reference's macro — bulk data comes in
  * through parquet/CSV sources.
  */
object toDf {

  def apply(spark: SparkSession)(pairs: (String, Any)*): DataTable = {
    require(pairs.nonEmpty, "toDf: at least one column required")
    val seqs: Seq[(String, Seq[Any])] = pairs.map {
      case (n, s: Seq[_]) => n -> s.asInstanceOf[Seq[Any]]
      case (n, a: Array[_]) => n -> a.toSeq.asInstanceOf[Seq[Any]]
      case (n, scalar) => n -> Seq(scalar)
    }
    val maxLen = seqs.map(_._2.length).max
    // length-1 columns broadcast to the full length (constant column);
    // other short columns null-fill (ragged construction)
    val extended = seqs.map { case (n, s) =>
      val full =
        if (s.length == maxLen) s
        else if (s.length == 1) Seq.fill(maxLen)(s.head)
        else s ++ Seq.fill(maxLen - s.length)(null)
      n -> full
    }
    val types = extended.map { case (n, s) => n -> lattice(s) }
    val schema = StructType(types.map { case (n, t) => StructField(n, t, nullable = true) })
    val rows = (0 until maxLen).map { i =>
      Row.fromSeq(extended.zip(types).map { case ((_, s), (_, t)) => coerce(s(i), t) })
    }
    DataTable(spark.createDataFrame(rows.asJava, schema))
  }

  /** The reference's promotion lattice over Scala element types. */
  private def lattice(vs: Seq[Any]): DataType = {
    val nn = vs.filter(v => v != null && v != None)
    if (nn.isEmpty) return StringType
    def isInt(v: Any) = v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
      v.isInstanceOf[Short] || v.isInstanceOf[Byte]
    def isFloat(v: Any) = v.isInstanceOf[Double] || v.isInstanceOf[Float]
    if (nn.forall(_.isInstanceOf[Boolean])) BooleanType
    else if (nn.forall(isInt)) LongType
    else if (nn.forall(v => isInt(v) || isFloat(v))) DoubleType
    else if (nn.forall(_.isInstanceOf[String])) StringType
    else StringType // mixed -> object column; string is our stand-in (SURVEY §7.5 risk 1)
  }

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) | (None, _) => null
    case (Some(x), _) => coerce(x, t)
    case (x: Int, LongType) => x.toLong
    case (x: Short, LongType) => x.toLong
    case (x: Byte, LongType) => x.toLong
    case (x: Long, LongType) => x
    case (x: Int, DoubleType) => x.toDouble
    case (x: Long, DoubleType) => x.toDouble
    case (x: Short, DoubleType) => x.toDouble
    case (x: Byte, DoubleType) => x.toDouble
    case (x: Float, DoubleType) => x.toDouble
    case (x: Double, DoubleType) => x
    case (x: Boolean, BooleanType) => x
    case (x: String, StringType) => x
    case (x, StringType) => x.toString
    case (x, other) => throw new IllegalArgumentException(s"toDf: cannot coerce $x to $other")
  }
}
