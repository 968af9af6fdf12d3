package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** The salted join must be output-identical to the plain join — salting
  * changes the plan, never the answer.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join under a hot key") {
    // key 1 is hot: 900 of 1000 rows
    val big = (1 to 1000)
      .map(i => (if (i <= 900) 1L else (i % 7).toLong + 2L, i.toLong))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "tag")
    val plain = big.join(small, "k")
      .groupBy("tag").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val salted = Skew.saltedJoin(big, small, "k",
      carriers = Seq($"v"), saltBuckets = 8)
      .groupBy("tag").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted === plain)
  }
}
