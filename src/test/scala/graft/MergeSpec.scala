package graft

import graft.pipeline.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-merge").toString + "/snap"

  test("upsert: insert + update + delete in one merge, updates win version ties") {
    import spark.implicits._
    val path = tmpDir()
    // bootstrap snapshot: keys 1..4 at version 1
    val s0 = Merge.upsert(spark, path,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 1L))
        .toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s0.resultRows == 4 && s0.inserted == 4 && s0.updated == 0)

    // batch: update key 2 (higher ver), stale update for key 3 (lower
    // ver loses), tie on key 4 (update wins), insert key 5, delete key 1,
    // tombstone for absent key 9 (no-op)
    val batch = Seq(
      (2L, "b2", 2L, false),
      (3L, "stale", 0L, false),
      (4L, "d2", 1L, false),
      (5L, "e", 1L, false),
      (1L, "x", 2L, true),
      (9L, "x", 2L, true))
      .toDF("id", "payload", "ver", "is_del")
    val s = Merge.upsert(spark, path, batch,
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))

    val out = spark.read.parquet(path).orderBy("id")
      .select("id", "payload").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "b2"), (3L, "c"), (4L, "d2"), (5L, "e")),
      s"snapshot: $out")
    assert(s.targetRows == 4 && s.resultRows == 4, s"stats: $s")
    assert(s.inserted == 1 && s.updated == 2 && s.deleted == 1, s"stats: $s")
    // the tombstone column never lands in the snapshot
    assert(!spark.read.parquet(path).columns.contains("is_del"))
  }

  test("upsert: same-key same-version tombstone vs live row resolves deterministically") {
    import spark.implicits._
    // the delete flag is part of the tie-break hash — three identical
    // merges must publish the identical outcome, whatever shuffle
    // order each run produced
    val outcomes = (1 to 3).map { _ =>
      val path = tmpDir()
      Merge.upsert(spark, path,
        Seq((1L, "seed", 1L)).toDF("id", "payload", "ver"),
        keys = Seq("id"), versionCol = "ver")
      Merge.upsert(spark, path,
        Seq((1L, "p", 5L, false), (1L, "p", 5L, true))
          .toDF("id", "payload", "ver", "del"),
        keys = Seq("id"), versionCol = "ver", deleteCol = Some("del"))
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    }
    assert(outcomes.distinct.size == 1,
      s"tombstone/live tie must resolve identically across reruns: $outcomes")
  }

  test("upsertPartitioned touches only the updated partitions") {
    import spark.implicits._
    val path = tmpDir()
    // bootstrap two partitions
    Merge.upsertPartitioned(spark, path,
      Seq((2024, 1L, "a", 1L), (2024, 2L, "b", 1L), (2025, 3L, "c", 1L))
        .toDF("year", "id", "payload", "ver"),
      partCol = "year", keys = Seq("id"), versionCol = "ver")
    val untouchedFiles = new java.io.File(s"$path/year=2025").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap

    val s = Merge.upsertPartitioned(spark, path,
      Seq((2024, 2L, "b2", 2L), (2024, 4L, "d", 1L))
        .toDF("year", "id", "payload", "ver"),
      partCol = "year", keys = Seq("id"), versionCol = "ver")
    assert(s.inserted == 1 && s.updated == 1, s"stats: $s")

    // the whole snapshot reads back as one partitioned table
    val all = spark.read.parquet(path)
      .select(col("year"), col("id"), col("payload"))
      .as[(Int, Long, String)].collect().toSet
    assert(all == Set((2024, 1L, "a"), (2024, 2L, "b2"), (2024, 4L, "d"),
      (2025, 3L, "c")), s"snapshot: $all")
    // the untouched partition's files were not rewritten
    val after = new java.io.File(s"$path/year=2025").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == untouchedFiles, "untouched partition was rewritten")
  }

  test("upsertPartitioned: an all-tombstoned partition stays a readable zero-row snapshot") {
    import spark.implicits._
    val path = tmpDir()
    Merge.upsertPartitioned(spark, path,
      Seq((1, 1L, "a", 1L, false), (1, 2L, "b", 1L, false), (2, 3L, "c", 1L, false))
        .toDF("shard", "id", "payload", "ver", "del"),
      partCol = "shard", keys = Seq("id"), versionCol = "ver",
      deleteCol = Some("del"))
    // tombstone EVERY row of shard 1: the writer emits no dir for it,
    // and the published empty partition must still carry a schema
    Merge.upsertPartitioned(spark, path,
      Seq((1, 1L, "a", 2L, true), (1, 2L, "b", 2L, true))
        .toDF("shard", "id", "payload", "ver", "del"),
      partCol = "shard", keys = Seq("id"), versionCol = "ver",
      deleteCol = Some("del"))
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSet
      == Set(3L), "tombstoned shard must read as zero rows")
    // the NEXT merge into the emptied partition must be able to read
    // it (a schema-less _SUCCESS-only dir would crash here)
    val s = Merge.upsertPartitioned(spark, path,
      Seq((1, 9L, "z", 3L, false)).toDF("shard", "id", "payload", "ver", "del"),
      partCol = "shard", keys = Seq("id"), versionCol = "ver",
      deleteCol = Some("del"))
    assert(s.inserted == 1, s"stats: $s")
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSet
      == Set(3L, 9L))
  }

  test("upsertPartitioned: typed partition values (timestamp) name directories the writer's way") {
    import spark.implicits._
    val path = tmpDir()
    // java.sql.Timestamp.toString renders a trailing ".0" that Spark's
    // partitioned writer does NOT — the dir name must come from the
    // SQL cast, or the swap would publish a fabricated empty dir over
    // the real merged output and silently drop the partition
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2025-06-15 12:30:00")
    Merge.upsertPartitioned(spark, path,
      Seq((t1, 1L, "a", 1L), (t2, 2L, "b", 1L)).toDF("day", "id", "payload", "ver"),
      partCol = "day", keys = Seq("id"), versionCol = "ver")
    val s = Merge.upsertPartitioned(spark, path,
      Seq((t1, 1L, "a2", 2L), (t1, 3L, "c", 1L)).toDF("day", "id", "payload", "ver"),
      partCol = "day", keys = Seq("id"), versionCol = "ver")
    assert(s.updated == 1 && s.inserted == 1, s"stats: $s")
    val got = spark.read.parquet(path).select("id", "payload")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b"), (3L, "c")), s"snapshot: $got")
  }

  test("upsert: add-column schema evolution null-fills the snapshot side") {
    import spark.implicits._
    val path = tmpDir()
    Merge.upsert(spark, path,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")

    // batch carries a NEW column `region`: key 2 updated with a value,
    // key 3 inserted — key 1 (untouched) reads null for it
    val s = Merge.upsert(spark, path,
      Seq((2L, "b2", 2L, "eu"), (3L, "c", 1L, "us"))
        .toDF("id", "payload", "ver", "region"),
      keys = Seq("id"), versionCol = "ver")
    assert(s.inserted == 1 && s.updated == 1, s"stats: $s")

    val out = spark.read.parquet(path).orderBy("id")
      .select("id", "payload", "region")
      .as[(Long, String, Option[String])].collect().toSeq
    assert(out == Seq((1L, "a", None), (2L, "b2", Some("eu")),
      (3L, "c", Some("us"))), s"evolved snapshot: $out")

    // and the evolved snapshot keeps working through ANOTHER publish
    // (rename-swap) with the evolved schema
    val s2 = Merge.upsert(spark, path,
      Seq((1L, "a2", 2L, "ap")).toDF("id", "payload", "ver", "region"),
      keys = Seq("id"), versionCol = "ver")
    assert(s2.updated == 1 && s2.resultRows == 3)

    // going backward — a batch MISSING a snapshot column — fails loudly
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(spark, path,
        Seq((4L, "d", 1L)).toDF("id", "payload", "ver"),
        keys = Seq("id"), versionCol = "ver")
    }
    assert(e.getMessage.contains("region"))
  }

  test("scd2: change closes the interval, no-change suppresses, delete ends history") {
    import spark.implicits._
    val path = tmpDir()
    // bootstrap: three keys at version 1
    val s0 = Merge.scd2(spark, path,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s0.inserted == 3 && s0.closed == 0 && s0.currentRows == 3, s"$s0")

    // batch: key 1 changes (close + open), key 2 unchanged (suppress),
    // key 3 tombstoned (close, nothing opens), key 4 new
    val batch = Seq(
      (1L, "a2", 5L, false),
      (2L, "b", 5L, false),
      (3L, "c", 5L, true),
      (4L, "d", 5L, false)).toDF("id", "payload", "ver", "is_del")
    val s = Merge.scd2(spark, path, batch,
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    assert(s.inserted == 2 && s.closed == 2 && s.deleted == 1 &&
      s.suppressed == 1, s"$s")

    val snap = spark.read.parquet(path)
      .select("id", "payload", "_valid_from", "_valid_to", "_is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(snap == Set(
      (1L, "a", 1L, Some(5L), false),   // closed at the change
      (1L, "a2", 5L, None, true),       // the new open interval
      (2L, "b", 1L, None, true),        // suppressed: untouched
      (3L, "c", 1L, Some(5L), false),   // tombstoned: closed, no current
      (4L, "d", 5L, None, true)), s"snapshot: $snap")
    assert(s.currentRows == 3 && s.resultRows == 5, s"$s")
  }

  test("scd2: idempotent re-apply, late rows dropped, re-insert after delete not suppressed") {
    import spark.implicits._
    val path = tmpDir()
    Merge.scd2(spark, path,
      Seq((1L, "a", 3L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")

    // re-applying the exact same feed must change NOTHING
    val again = Merge.scd2(spark, path,
      Seq((1L, "a", 3L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(again.inserted == 0 && again.closed == 0 &&
      again.resultRows == 1, s"$again")

    // a LATE row (version <= open valid_from) is dropped even if it
    // differs — history rewrite is not a merge
    val late = Merge.scd2(spark, path,
      Seq((1L, "z", 2L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(late.inserted == 0 && late.suppressed == 1, s"$late")

    // delete then payload-identical re-insert IN ONE BATCH: the
    // re-insert survives (prior state is "absent", not "a")
    val s = Merge.scd2(spark, path,
      Seq((1L, "a", 5L, true), (1L, "a", 7L, false))
        .toDF("id", "payload", "ver", "is_del"),
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    assert(s.inserted == 1 && s.deleted == 1, s"$s")
    val snap = spark.read.parquet(path)
      .select("id", "payload", "_valid_from", "_valid_to", "_is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(snap == Set(
      (1L, "a", 3L, Some(5L), false),
      (1L, "a", 7L, None, true)), s"snapshot: $snap")
  }

  test("scd2: a multi-version batch chains intervals; same-version dup keeps one winner") {
    import spark.implicits._
    val path = tmpDir()
    // one batch carrying a key's whole life: a@1, a@2 (suppressed),
    // b@4, b@4 dup (one winner), c@9
    val s = Merge.scd2(spark, path,
      Seq((1L, "a", 1L), (1L, "a", 2L), (1L, "b", 4L), (1L, "b", 4L),
        (1L, "c", 9L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s.inserted == 3 && s.closed == 2, s"$s")
    val snap = spark.read.parquet(path)
      .select("payload", "_valid_from", "_valid_to", "_is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().toSet
    assert(snap == Set(
      ("a", 1L, Some(4L), false),
      ("b", 4L, Some(9L), false),
      ("c", 9L, None, true)), s"snapshot: $snap")
    // closed history is immutable: the next merge passes it through
    val s2 = Merge.scd2(spark, path,
      Seq((1L, "d", 11L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s2.resultRows == 4 && s2.currentRows == 1, s"$s2")
    val cur = spark.read.parquet(path).filter(col("_is_current"))
      .select("payload", "_valid_from").as[(String, Long)].collect().toSeq
    assert(cur == Seq(("d", 11L)))
    val closedC = spark.read.parquet(path)
      .filter(col("payload") === "c").select("_valid_to")
      .as[Option[Long]].collect().toSeq
    assert(closedC == Seq(Some(11L)), s"c not closed at 11: $closedC")
  }

  test("scd2: a tombstoned key's closed history gates late and replayed rows (hwm, not open interval)") {
    import spark.implicits._
    val path = tmpDir()
    // batch 1 carries the key's whole life INCLUDING its death:
    // insert@1, change@3, tombstone@5 — afterwards no open interval
    val life = Seq((1L, "a", 1L, false), (1L, "b", 3L, false),
      (1L, "", 5L, true)).toDF("id", "payload", "ver", "is_del")
    Merge.scd2(spark, path, life,
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    val after = spark.read.parquet(path)
      .select("id", "payload", "_valid_from", "_valid_to", "_is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(after == Set(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(5L), false)), s"$after")

    // crash-window replay of the SAME batch: every row is at or below
    // the closed history's high-water mark (5) -> provable no-op.
    // Before the hwm gate this re-opened history and DUPLICATED the
    // closed rows (the open-interval gate saw no current row at all).
    val s1 = Merge.scd2(spark, path, life,
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    assert(s1.inserted == 0 && s1.closed == 0 && s1.deleted == 0 &&
      s1.suppressed == 3, s"replay not a no-op: $s1")
    val replayed = spark.read.parquet(path)
      .select("id", "payload", "_valid_from", "_valid_to", "_is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(replayed == after, s"replay mutated history: $replayed")

    // a LATE row below the close version must not re-open the key
    val s2 = Merge.scd2(spark, path,
      Seq((1L, "z", 4L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s2.inserted == 0 && s2.suppressed == 1, s"late row applied: $s2")
    // but a row ABOVE it legitimately resurrects the key
    val s3 = Merge.scd2(spark, path,
      Seq((1L, "z", 7L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s3.inserted == 1, s"$s3")
    assert(Merge.asOf(spark.read.parquet(path), lit(7L))
      .count() == 1L)
  }

  test("scd2: payloads differing only in which column is null are a REAL change") {
    import spark.implicits._
    val path = tmpDir()
    Merge.scd2(spark, path,
      Seq((1L, Option.empty[String], Option("x"), 1L)).toDF("id", "a", "b", "ver"),
      keys = Seq("id"), versionCol = "ver")
    // null shifts column: a hash that skips null children calls these
    // equal and silently suppresses the change
    val s = Merge.scd2(spark, path,
      Seq((1L, Option("x"), Option.empty[String], 5L)).toDF("id", "a", "b", "ver"),
      keys = Seq("id"), versionCol = "ver")
    assert(s.inserted == 1 && s.closed == 1 && s.suppressed == 0,
      s"null-shifted payload suppressed: $s")
    val cur = spark.read.parquet(path).filter(col("_is_current"))
      .select("a", "b").as[(Option[String], Option[String])].collect().toSeq
    assert(cur == Seq((Some("x"), None)), s"$cur")
  }

  test("scd2: a keys+version-only dimension (empty payload) tracks presence intervals") {
    import spark.implicits._
    val path = tmpDir()
    // member appears at 1, disappears at 4, reappears at 9
    Merge.scd2(spark, path,
      Seq((1L, 1L, false), (1L, 4L, true), (1L, 9L, false))
        .toDF("id", "ver", "is_del"),
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    val snap = spark.read.parquet(path)
      .select("id", "_valid_from", "_valid_to", "_is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(snap == Set(
      (1L, 1L, Some(4L), false),
      (1L, 9L, None, true)), s"$snap")
    // a live re-send while present is suppressed (payload-identical)
    val s = Merge.scd2(spark, path,
      Seq((1L, 11L, false)).toDF("id", "ver", "is_del"),
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    assert(s.inserted == 0 && s.suppressed == 1, s"$s")
  }

  test("scd2 + asOf: time travel reproduces every historical state, half-open at the edge") {
    import spark.implicits._
    val path = tmpDir()
    Merge.scd2(spark, path,
      Seq((1L, "a", 1L), (1L, "b", 4L), (1L, "c", 9L), (2L, "x", 4L))
        .toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    Merge.scd2(spark, path,
      Seq((2L, "", 6L, true)).toDF("id", "payload", "ver", "is_del"),
      keys = Seq("id"), versionCol = "ver", deleteCol = Some("is_del"))
    val hist = spark.read.parquet(path)
    def at(v: Long): Set[(Long, String)] =
      Merge.asOf(hist, lit(v)).select("id", "payload")
        .as[(Long, String)].collect().toSet
    assert(at(0L) == Set.empty, s"${at(0L)}")
    assert(at(1L) == Set(1L -> "a"), s"${at(1L)}")
    assert(at(3L) == Set(1L -> "a"), s"${at(3L)}")
    // the closing change takes effect AT its version: half-open edge
    assert(at(4L) == Set(1L -> "b", 2L -> "x"), s"${at(4L)}")
    assert(at(5L) == Set(1L -> "b", 2L -> "x"), s"${at(5L)}")
    assert(at(6L) == Set(1L -> "b"), s"tombstone at 6 must hide key 2: ${at(6L)}")
    assert(at(9L) == Set(1L -> "c"), s"${at(9L)}")
    // asOf(latest) == the current rows
    val cur = hist.filter(col("_is_current"))
      .select("id", "payload").as[(Long, String)].collect().toSet
    assert(at(Long.MaxValue) == cur)
  }

  test("temporalJoin: each fact sees the dimension state at its own version") {
    import spark.implicits._
    val path = tmpDir()
    // customer 1: bronze@1 -> gold@5 -> tombstoned@9; customer 2: flat
    Merge.scd2(spark, path,
      Seq((1L, "bronze", 1L, false), (1L, "gold", 5L, false),
        (1L, "", 9L, true), (2L, "silver", 2L, false))
        .toDF("cust", "tier", "ver", "is_del"),
      keys = Seq("cust"), versionCol = "ver", deleteCol = Some("is_del"))
    val hist = spark.read.parquet(path)
    val facts = Seq(
      (100L, 1L, 1L),   // at the opening version -> bronze
      (101L, 1L, 4L),   // inside [1,5) -> bronze
      (102L, 1L, 5L),   // half-open edge: change takes effect -> gold
      (103L, 1L, 9L),   // at the tombstone -> no state
      (104L, 1L, 0L),   // before any history -> no state
      (105L, 2L, 7L),   // open interval -> silver
      (106L, 3L, 3L))   // unknown key -> no state
      .toDF("order_id", "cust", "ver")

    val out = Merge.temporalJoin(facts, hist, Seq("cust"), col("ver"))
      .select("order_id", "tier").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(
      100L -> Some("bronze"), 101L -> Some("bronze"),
      102L -> Some("gold"), 103L -> None, 104L -> None,
      105L -> Some("silver"), 106L -> None), s"$out")
    // every fact exactly once — intervals never overlap
    assert(out.size == 7)

    // inner form drops the unmatched
    val inner = Merge.temporalJoin(facts, hist, Seq("cust"), col("ver"),
        keepUnmatched = false)
      .select("order_id").as[Long].collect().sorted.toSeq
    assert(inner == Seq(100L, 101L, 102L, 105L), s"$inner")
  }

  test("upsert plan: one exchange on the key, no join") {
    import spark.implicits._
    val path = tmpDir()
    Merge.upsert(spark, path,
      Seq((1L, "a", 1L)).toDF("id", "payload", "ver"),
      keys = Seq("id"), versionCol = "ver")
    val upd = Seq((1L, "a2", 2L)).toDF("id", "payload", "ver")
    val tgt = spark.read.parquet(path)
    // replicate the merge plan shape (window over union) and check it
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("ver").desc)
    val plan = tgt.unionByName(upd)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"merge must not join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one key exchange:\n$plan")
  }
}
