package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.medallion.SilverTransforms

class MedallionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bronzeUsers = {
    import spark.implicits._
    Seq(
      // (id, first_name, last_name, email, age, gender, state, city, traffic, created_at, processed_at, dupflag)
      ("1", "  ann  ", "SMITH", "Ann@Ex.COM", "30", "F", "ca", "paris", "Search", "2024-01-02 10:00:00", 10L, false),
      ("1", "late ann", "smith", "ann@late.com", "31", "FEMALE", "TX", "oslo", "late", "1/3/2024 10:00:00", 11L, false),
      ("1", "junk", "junk", "x", "x", "x", "x", "x", "x", "x", 12L, true),
      ("2", "N/A", "bob", "not an email", "unknown", "M", "new york", " rome ", "EMAIL", "03.01.2024 05:06:07", 20L, false),
      ("xx", "carl", "doe", "c@d.io", "40", "nonbinary", " wa ", "SAN JOSE", "Display", "20240104 01:02:03", 30L, false),
      ("yy", "dora", "doe", "d@d.io", "41", "f", "TX", "lima", "Search", "2024-01-05 00:00:00", 31L, false)
    ).toDF("id", "first_name", "last_name", "email", "age", "gender", "state",
      "city", "traffic_source", "created_at", "processed_at", "is_duplicate_in_file")
  }

  test("silver users: keep-latest wins, in-file dups never surface, cleaners apply") {
    val out = SilverTransforms.users(bronzeUsers, lit(null).cast("timestamp_ntz"))
      .collect().map(r => r.getAs[Any]("id") -> r).toMap
    // id=1: the late reload (processed_at=11) wins; the flagged row never surfaces
    val r1 = out(1L)
    assert(r1.getAs[String]("first_name") == "Late Ann")
    assert(r1.getAs[String]("email") == "ann@late.com")
    assert(r1.getAs[Long]("age") == 31L)
    assert(r1.getAs[String]("gender") == "Female")
    // id=2: sentinel first_name -> NULL, invalid email -> NULL, age junk -> NULL
    val r2 = out(2L)
    assert(r2.getAs[String]("first_name") == null)
    assert(r2.getAs[String]("email") == null)
    assert(r2.getAs[Any]("age") == null)
    assert(r2.getAs[String]("state") == "New York")
    assert(r2.getAs[String]("city") == "Rome")
    // uncastable pks share the NULL partition: exactly ONE survives (latest)
    assert(out.contains(null))
    assert(out.size == 3)
    assert(out(null).getAs[String]("first_name") == "Dora")
  }

  test("silver users: all four timestamp formats parse, junk stays NULL") {
    import spark.implicits._
    val b = Seq(
      ("1", "2024-01-02 10:00:00", 1L, false),
      ("2", "1/3/2024 10:00:00", 2L, false),
      ("3", "03.01.2024 05:06:07", 3L, false),
      ("4", "20240104 01:02:03", 4L, false),
      ("5", "not a date", 5L, false))
      .toDF("id", "created_at", "processed_at", "is_duplicate_in_file")
      .withColumn("first_name", lit("x")).withColumn("last_name", lit("x"))
      .withColumn("email", lit("x")).withColumn("age", lit("1"))
      .withColumn("gender", lit("F")).withColumn("state", lit("CA"))
      .withColumn("city", lit("x")).withColumn("traffic_source", lit("x"))
    val got = SilverTransforms.users(b, current_timestamp().cast("timestamp_ntz"))
      .select("id", "created_at").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    // timestamp_ntz surfaces as java.time.LocalDateTime (ISO rendering)
    assert(got(1L).contains("2024-01-02T10:00"))
    assert(got(2L).contains("2024-01-03T10:00"))
    assert(got(3L).contains("2024-01-03T05:06:07"))
    assert(got(4L).contains("2024-01-04T01:02:03"))
    assert(got(5L).isEmpty)
  }

  test("runProgram: full rebuild then incremental upsert into the lake") {
    import spark.implicits._
    val lake = new graft.lake.ParquetDirFormat(
      java.nio.file.Files.createTempDirectory("graft-silver-lake").toString)
    val n1 = SilverTransforms.runProgram("users", bronzeUsers, lake, "silver_users",
      lit(null).cast("timestamp_ntz"))
    assert(n1 == 3)
    // an incremental batch re-delivers id=2 (newer), a brand-new id=7, and an
    // uncastable pk — the NULL-key row must REPLACE the existing NULL-key
    // representative (null-safe upsert), not accumulate beside it
    val batch = Seq(
      ("2", "Bea", "Jones", "bea@j.io", "33", "F", "OR", "salem", "Email", "2024-02-02 08:00:00", 40L, false),
      ("7", "Gil", "Moss", "gil@m.io", "50", "M", "ID", "boise", "Ads", "2024-02-03 09:00:00", 41L, false),
      ("zz", "Eve", "Null", "e@n.io", "28", "F", "NV", "reno", "Ads", "2024-02-04 10:00:00", 42L, false))
      .toDF("id", "first_name", "last_name", "email", "age", "gender", "state",
        "city", "traffic_source", "created_at", "processed_at", "is_duplicate_in_file")
    val n2 = SilverTransforms.runProgram("users", batch, lake, "silver_users",
      lit(null).cast("timestamp_ntz"), incremental = true)
    assert(n2 == 4, "id=2 and null-id replaced, id=7 inserted, id=1 kept")
    val rows = lake.read(spark, "silver_users").collect()
      .map(r => r.getAs[Any]("id") -> r.getAs[String]("first_name")).toMap
    assert(rows(2L) == "Bea", "upsert replaced the old id=2 row")
    assert(rows(7L) == "Gil")
    assert(rows(1L) == "Late Ann", "untouched keys survive the upsert")
    assert(rows(null) == "Eve", "NULL pk row replaced, not duplicated")
  }

  test("silver dedup is one pk shuffle: a single exchange for the keep-latest agg") {
    val plan = SilverTransforms.dedupLatest(bronzeUsers, "id")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"expected a single shuffle for the dedup window, got plan:\n$plan")
  }
}
