package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The mergeable top-k-by-score SELECTION aggregate: equivalence to
  * the ranking-window formulation (including under duplicate ids,
  * where unlike TopKFreq it stays exact — selection is a monoid),
  * partitioning stability, and the (score DESC, id ASC) order. */
class TopKByScoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def scored = {
    import spark.implicits._
    // per-(probe, candidate) cosine scores: many groups, wide fan-out
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val other = e.select($"vec_id".as("nb"), $"v".as("nv"))
    e.filter($"vec_id" < 40).select($"vec_id".as("src"), $"v")
      .join(broadcast(other), $"src" =!= $"nb")
      .select($"src", $"nb", GraftFunctions.cosine_sim($"v", $"nv").as("c"))
  }

  test("equals the ranking-window top-k for every group") {
    import spark.implicits._
    val agg = scored.groupBy("src")
      .agg(GraftFunctions.topk_by_score($"nb", $"c", 5).as("tk"))
      .select($"src", posexplode($"tk"))
      .select($"src", $"col.id".as("nb"), $"col.score".as("c"),
        ($"pos" + 1).cast("int").as("rnk"))
    val win = scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("src").orderBy($"c".desc, $"nb")))
      .filter($"rnk" <= 5)
      .select($"src", $"nb", $"c", $"rnk")
    assert(agg.collect().toSet == win.collect().toSet)
  }

  test("stable under different input partitionings (associative merge)") {
    import spark.implicits._
    def run(parts: Int) = scored.repartition(parts).groupBy("src")
      .agg(GraftFunctions.topk_by_score($"nb", $"c", 3).as("tk"))
      .select($"src", $"tk").collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).toList).toMap
    assert(run(2) == run(17))
  }

  test("exact under duplicate ids (selection monoid, unlike topk_freq)") {
    import spark.implicits._
    // same id appears many times with different scores spread across
    // partitions; the k-best rows survive regardless of buffer splits
    val rows = (1 to 1000).map(i => (i.toLong % 7, (i % 13).toDouble))
    val df = spark.createDataset(rows).toDF("id", "s").repartition(11)
    val got = df.agg(GraftFunctions.topk_by_score($"id", $"s", 4).as("tk"))
      .select(explode($"tk").as("e")).select($"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val want = rows.sortBy { case (id, s) => (-s, id) }.take(4).toList
    assert(got == want)
  }
}
