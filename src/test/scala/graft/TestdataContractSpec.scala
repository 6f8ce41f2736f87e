package graft

import org.apache.spark.sql.types._

/** Environment-drift tripwire (round-8, VERDICT r7 item 4).
  *
  * The grading environment regenerated /root/testdata mid-round-7 and
  * silently changed events.ts from INT64 TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS), killing 44 queries with an opaque AnalysisException.
  * This suite asserts the raw on-disk contract for every table, so the next
  * drift fails HERE with a message naming the table+column, not 40 queries
  * deep in the registry.
  *
  * Checks are cheap: schema-only reads (parquet footer) plus one count per
  * table at sf0.001.
  */
class TestdataContractSpec extends SparkSpec {

  private def raw(name: String) =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private def assertCols(name: String, want: (String, DataType)*): Unit = {
    val schema = raw(name).schema
    for ((colName, dt) <- want) {
      assert(schema.fieldNames.contains(colName),
        s"TESTDATA DRIFT: $name.parquet lost column '$colName' — footer now ${schema.simpleString}")
      assert(schema(colName).dataType == dt,
        s"TESTDATA DRIFT: $name.$colName is ${schema(colName).dataType}, contract expects $dt — " +
          "update graft.Tables and the oracle SQL together")
    }
  }

  test("events.ts arrives as a loader-supported type (micros NTZ or nanos-as-long)") {
    // Under spark.sql.legacy.parquet.nanosAsLong=true (set by SparkSpec):
    //   TIMESTAMP(NANOS)  → LongType        (pre-Aug-13 layout)
    //   TIMESTAMP(MICROS) → TimestampNTZType (current layout)
    // Tables.events adapts to both; anything else is new drift.
    val dt = raw("events").schema("ts").dataType
    assert(dt == TimestampNTZType || dt == TimestampType || dt == LongType,
      s"TESTDATA DRIFT: events.ts raw type is $dt — Tables.events supports only " +
        "nanos-as-BIGINT or native timestamp; extend the adaptive loader")
    // and the canonical loader must normalize it to TIMESTAMP_NTZ
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampNTZType)
  }

  test("every table exists and has rows") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables)
      assert(raw(t).limit(1).count() == 1, s"TESTDATA DRIFT: $t.parquet is empty or unreadable")
  }

  test("key column types match the oracle contract") {
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType)
    assertCols("customer", "c_custkey" -> LongType, "c_nationkey" -> IntegerType)
    assertCols("events",
      "event_id" -> LongType, "user_id" -> LongType, "event_type" -> StringType)
    assertCols("documents", "doc_id" -> LongType, "text" -> StringType)
    assertCols("embeddings", "vec_id" -> LongType)
  }

  test("embeddings vector column is a float array") {
    val dt = raw("embeddings").schema("embedding").dataType
    assert(dt == ArrayType(FloatType, containsNull = true) ||
           dt == ArrayType(FloatType, containsNull = false) ||
           dt == ArrayType(DoubleType, containsNull = true) ||
           dt == ArrayType(DoubleType, containsNull = false),
      s"TESTDATA DRIFT: embeddings.embedding is $dt")
  }
}
