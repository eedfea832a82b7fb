package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Faithful representation of the reference's dynamic `Value` scalar
  * (`value.nim:4-25`) as a tagged variant struct — the "custom variant
  * struct" option from SURVEY §1.3 / §7.5 risk 1, for pipelines that
  * need true mixed-type columns instead of the default
  * promote-to-string collapse.
  *
  * Physical shape: `struct<tag: int, i: long, d: double, s: string,
  * b: boolean>` with exactly one active field per tag
  * (0=null/VNull, 1=VInt, 2=VFloat, 3=VString, 4=VBool; VObject rows
  * are out of scope — Spark's own StructType is the faithful home for
  * records). All operations are plain column expressions: tagged
  * structs group, join, shuffle and compare like any other column.
  */
object ValueColumn {

  val TagNull = 0
  val TagInt = 1
  val TagFloat = 2
  val TagString = 3
  val TagBool = 4

  val ValueType: StructType = StructType(Seq(
    StructField("tag", IntegerType, nullable = false),
    StructField("i", LongType), StructField("d", DoubleType),
    StructField("s", StringType), StructField("b", BooleanType)))

  private def make(tag: Column, i: Column, d: Column, s: Column, b: Column): Column =
    struct(tag.as("tag"), i.cast(LongType).as("i"), d.cast(DoubleType).as("d"),
      s.cast(StringType).as("s"), b.cast(BooleanType).as("b"))

  private val nullL = lit(null).cast(LongType)
  private val nullD = lit(null).cast(DoubleType)
  private val nullS = lit(null).cast(StringType)
  private val nullB = lit(null).cast(BooleanType)

  /** Wrap a typed column as Values (null cells become VNull). */
  def toValue(c: Column, dt: DataType): Column = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      when(c.isNull, vnull).otherwise(make(lit(TagInt), c, nullD, nullS, nullB))
    case DoubleType | FloatType =>
      when(c.isNull, vnull).otherwise(make(lit(TagFloat), nullL, c, nullS, nullB))
    case StringType =>
      when(c.isNull, vnull).otherwise(make(lit(TagString), nullL, nullD, c, nullB))
    case BooleanType =>
      when(c.isNull, vnull).otherwise(make(lit(TagBool), nullL, nullD, nullS, c))
    case other =>
      throw new IllegalArgumentException(s"toValue: unsupported type $other")
  }

  /** The VNull literal (`value.nim:4-9`). */
  def vnull: Column = make(lit(TagNull), nullL, nullD, nullS, nullB)

  def isNullValue(v: Column): Column = v.getField("tag") === TagNull

  /** Numeric view (VInt and VFloat as double; others null) — the basis of
    * the reference's cross-kind numeric comparisons (`value.nim:410-442`). */
  def asDouble(v: Column): Column =
    when(v.getField("tag") === TagInt, v.getField("i").cast(DoubleType))
      .when(v.getField("tag") === TagFloat, v.getField("d"))

  /** Stringified form, like the reference's `$` on Value. */
  def asString(v: Column): Column =
    when(v.getField("tag") === TagInt, v.getField("i").cast(StringType))
      .when(v.getField("tag") === TagFloat, v.getField("d").cast(StringType))
      .when(v.getField("tag") === TagString, v.getField("s"))
      .when(v.getField("tag") === TagBool, v.getField("b").cast(StringType))
      .otherwise(lit("null"))

  /** Value equality (`value.nim:410-442`): VNull == VNull is TRUE (the
    * reference is null-safe, not SQL three-valued — SURVEY §1.2);
    * VInt/VFloat compare numerically; other kinds require the same tag.
    * Exact arithmetic in-engine — the reference's 1e-8 epsilon is
    * confined to the test comparator per SURVEY §7.5 risk 3. */
  def valueEq(a: Column, b: Column): Column = {
    val bothNull = isNullValue(a) && isNullValue(b)
    val bothNum = a.getField("tag").isin(TagInt, TagFloat) &&
      b.getField("tag").isin(TagInt, TagFloat)
    when(bothNull, lit(true))
      .when(bothNum, asDouble(a) === asDouble(b))
      .otherwise(a.getField("tag") === b.getField("tag") &&
        asString(a) <=> asString(b))
  }

  /** Total-order sort key: VNull first, then numerics by value, then
    * strings/bools lexically. NOTE a documented divergence: the
    * reference's pairwise `<` compares a number with a string by their
    * STRINGIFIED forms (`value.nim:464-503`), which is not expressible
    * as a sort key (it violates key-transitivity); this key keeps
    * numeric and lexical ranges disjoint instead. */
  def sortKey(v: Column): Column = struct(
    when(isNullValue(v), 0).when(v.getField("tag").isin(TagInt, TagFloat), 1)
      .otherwise(2).as("grp"),
    asDouble(v).as("num"),
    asString(v).as("str"))

  /** Convert every listed column of `df` to Values — the ragged/mixed
    * `bind_rows` path that keeps type tags instead of collapsing to
    * string (`dataframe.nim:978-996` fills with VNull). */
  def promote(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, toValue(col(c), d.schema(c).dataType))
    }

  /** Demote a Value column back to its native type — raises if the
    * column is genuinely mixed, mirroring `toNativeColumn`
    * (`column.nim:1039-1048`; pinned by testDf.nim:1571-1608). One
    * tiny aggregate to learn the tag set, then a cast projection. */
  def toNative(df: DataFrame, c: String): DataFrame = {
    val tags = df.select(collect_set(col(c).getField("tag")).as("t"))
      .head().getSeq[Int](0).filterNot(_ == TagNull).sorted
    require(tags.size <= 1,
      s"toNative: column $c holds mixed Value kinds (tags ${tags.mkString(",")})")
    val v = col(c)
    val out = tags.headOption match {
      case None | Some(TagString) => when(!isNullValue(v), v.getField("s"))
      case Some(TagInt) => when(!isNullValue(v), v.getField("i"))
      case Some(TagFloat) => when(!isNullValue(v), v.getField("d"))
      case Some(TagBool) => when(!isNullValue(v), v.getField("b"))
      case Some(other) => throw new IllegalArgumentException(s"bad tag $other")
    }
    df.withColumn(c, out)
  }
}
