package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format of training-data
  * pipelines (one JSON object per line, so files split by line and every
  * format stage stays embarrassingly parallel). Beyond-reference
  * (the reference's serialization is CSV + HDF5, `io.nim`, `serialize.nim`).
  *
  * Scale rules baked in:
  *  - `multiLine` stays false: a JSONL file splits at line boundaries, so
  *    a 1 TB file fans out across executors; multi-line JSON is a single
  *    unsplittable blob per file.
  *  - pass an explicit schema for production reads: inference is a full
  *    extra pass over the data (2× the I/O) and can widen types between
  *    runs; `readJsonl` takes the schema up front and only falls back to
  *    inference when none is given (interactive use).
  *  - corrupt lines don't kill the job: PERMISSIVE mode lands them in
  *    `_corrupt_record` for quarantine (the curation pipeline's "route
  *    bad rows to a side table" shape); DROPMALFORMED / FAILFAST are
  *    pass-through options.
  */
object Jsonl {

  /** Parallel JSONL writer: `path` becomes a directory of part files. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Distributed JSONL reader. `schema=None` infers (extra pass — fine
    * interactively, not in production); `mode` is PERMISSIVE (default,
    * corrupt lines → `_corrupt_record` column when it is in the schema) /
    * DROPMALFORMED / FAILFAST. */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[StructType] = None,
                mode: String = "PERMISSIVE"): DataFrame = {
    val r = spark.read
      .option("mode", mode)
      .option("multiLine", "false")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}
