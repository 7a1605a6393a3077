package graft

import graft.operators.Dedup

/** F7: connected components by min-label propagation. */
class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain, triangle and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("label propagates across a long chain (diameter > one round)") {
    // 8-node path given in worst-case order: needs several rounds
    val edges = (1L to 7L).map(i => (i, i + 1))
    val got = components(edges)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 8L).toSet)
  }

  test("self-loops and duplicate edges are harmless") {
    val got = components(Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)))
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }
}
