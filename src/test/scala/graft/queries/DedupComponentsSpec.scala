package graft.queries

import graft.SparkTestBase

/** q18's clustering core: min-label propagation over verified near-dup
  * pairs must produce the transitive duplicate groups with the min-doc_id
  * survivor rule (the DuckDB oracle replays the same semantics as a
  * recursive transitive closure — this spec pins the Spark side on
  * hand-checkable graphs, including a chain whose diameter forces
  * multiple propagation rounds). */
class DedupComponentsSpec extends SparkTestBase {
  import org.apache.spark.sql.functions.col

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, (Long, Int)] = {
    import spark.implicits._
    val df = pairs.toDF("doc_a", "doc_b")
    DedupOps.components(df)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
  }

  test("two components: transitive group picks min survivor") {
    val got = comps(Seq((1L, 2L), (2L, 3L), (7L, 9L)))
    assert(got === Map(
      1L -> ((1L, 1)), 2L -> ((1L, 0)), 3L -> ((1L, 0)),
      7L -> ((7L, 1)), 9L -> ((7L, 0))))
  }

  test("long chain converges across multiple propagation rounds") {
    // diameter-5 path 1-2-3-4-5-6 with edges listed far-from-min first:
    // the min label needs several rounds to reach node 6
    val got = comps(Seq((5L, 6L), (4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.values.map(_._1).toSet === Set(1L))
    assert(got.filter(_._2._2 == 1).keySet === Set(1L))
  }

  test("no pairs: no rows (docs without a verified duplicate never " +
       "enter the graph)") {
    assert(comps(Seq.empty).isEmpty)
  }

  test("q18 over the fixture corpus: every q13 pair lands in one group, " +
       "reps are group minima") {
    val dir = "/root/testdata/sf0.001"
    val pairs = DedupOps.jaccardPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = DedupOps.neardupComponents(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(got(a) === got(b), s"pair ($a,$b) split across groups")
      assert(got(a) <= math.min(a, b))
    }
    // every representative is a member of its own group and kept
    val kept = DedupOps.neardupComponents(spark, dir)
      .filter(col("keep") === 1).collect().map(_.getLong(0)).toSet
    assert(got.values.toSet === kept)
  }
}
