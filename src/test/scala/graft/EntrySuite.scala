package graft

/** The driver's smoke contract: entry() returns rows. */
class EntrySuite extends SparkSpec {
  test("entry() curation pipeline returns per-(split, lang) rollups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum > 0)
  }
}
