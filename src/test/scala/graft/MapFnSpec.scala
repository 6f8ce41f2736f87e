package graft

import org.apache.spark.sql.functions._

/** SURVEY.md §2.7's map-functions row: no map-typed column exists in the
  * testdata, so MapType construction/access is exercised here (unit-level)
  * rather than as an oracle query.
  */
class MapFnSpec extends SparkSpec {

  test("str_to_map / map access / map_from_entries round-trip") {
    import spark.implicits._
    val df = Seq("a:1,b:2,c:3").toDF("s")
      .withColumn("m", expr("str_to_map(s, ',', ':')"))
    val row = df.select(
      expr("m['b']").as("b"),
      map_keys(col("m")).as("ks"),
      map_values(col("m")).as("vs"),
      size(col("m")).as("n")).first()
    assert(row.getString(0) == "2")
    assert(row.getSeq[String](1) == Seq("a", "b", "c"))
    assert(row.getInt(3) == 3)

    val entries = spark.sql(
      "SELECT map_from_entries(array(struct('x', 10), struct('y', 20))) AS m")
      .select(expr("m['y']")).first().getInt(0)
    assert(entries == 20)
  }

  test("map built from the events props json: k distribution matches get_json_object") {
    val ev = Tables.events(spark, sfDir).limit(200)
    val viaMap = ev.select(
        expr("str_to_map(regexp_replace(props, '[{}\" ]', ''), ',', ':')").as("m"))
      .select(expr("CAST(m['k'] AS BIGINT)").as("k"))
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJson = ev.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMap == viaJson)
  }
}
