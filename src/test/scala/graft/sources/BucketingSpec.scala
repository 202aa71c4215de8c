package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join on the bucket key plans without a shuffle") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "orderkey"),
      "b_lineitem", "orderkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
        .withColumnRenamed("o_orderkey", "orderkey"),
      "b_orders", "orderkey", buckets = 4)

    // at this toy size the planner prefers broadcast; disable it so the
    // join must co-locate — which buckets satisfy without any shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = try {
      val j = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      j
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // and the result matches the plain join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === plain)
  }
}
