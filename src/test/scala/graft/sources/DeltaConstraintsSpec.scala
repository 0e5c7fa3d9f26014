package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** CHECK constraints (`delta.constraints.<name>` — the configuration key
  * delta-spark's ALTER TABLE ADD CONSTRAINT writes) and NOT NULL
  * invariants, enforced on every row-adding commit: create, append,
  * merge, overwrite (configuration is preserved, delta-spark
  * semantics) and upsert changesets. Delta CHECK semantics throughout
  * (delta-spark's CheckDeltaInvariant, stricter than SQL CHECK): a row
  * passes only when the expression evaluates TRUE — FALSE and NULL both
  * reject. Enforcement rides the staging scan via
  * `Dataset.observe` (one pass) and aborts BEFORE the log commit, so a
  * violating write leaves the table byte-identical and sweeps its stage.
  */
class DeltaConstraintsSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/constraints/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  private def commitVersions(p: String): Seq[String] = {
    val log = java.nio.file.Paths.get(p, "_delta_log")
    if (!java.nio.file.Files.exists(log)) Nil
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      java.nio.file.Files.list(log).forEach { f =>
        if (f.getFileName.toString.matches("\\d{20}\\.json"))
          out += f.getFileName.toString
      }
      out.toSeq.sorted
    }
  }

  private def noStageLeak(p: String): Unit = {
    val dir = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(dir))
      java.nio.file.Files.list(dir).forEach { f =>
        assert(!f.getFileName.toString.startsWith(".graft_stage"),
          s"leaked staging dir: $f")
      }
  }

  test("CHECK constraint gates create, append and merge; NULL rejects") {
    val sp = spark; import sp.implicits._
    val p = freshDir("check")
    // violating initial data: no table may appear at all
    val bad = intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((1L, Some(-5L)), (2L, Some(3L))).toDF("id", "qty"),
        "overwrite", p,
        tableProperties = Map("delta.constraints.qty_pos" -> "qty > 0"))
    }
    assert(bad.getMessage.contains("qty_pos"))
    assert(bad.getMessage.contains("1 row(s)"))
    assert(commitVersions(p).isEmpty, "violating create must not commit")
    noStageLeak(p)
    // valid create declares the checkConstraints writer floor (qty is
    // OPTION-wrapped so the declared schema keeps it nullable — a bare
    // Seq[(Long, Long)] frame would additionally declare a NOT NULL
    // invariant on qty and the NULL leg below would report that
    // invariant instead of the CHECK rejection it exercises)
    DeltaLog.write(Seq((1L, Some(5L)), (2L, Some(3L))).toDF("id", "qty"),
      "overwrite", p,
      tableProperties = Map("delta.constraints.qty_pos" -> "qty > 0"))
    val v0 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(p, "_delta_log", f"${0L}%020d.json"))
    assert(v0.contains(""""minWriterVersion":3"""),
      "a constrained table declares minWriterVersion 3")
    // a NULL-evaluating CHECK row REJECTS: delta-spark's
    // CheckDeltaInvariant requires the expression to evaluate TRUE for
    // every written row (deliberately stricter than SQL CHECK, where
    // NULL passes) — committing the NULL row would write data other
    // delta engines refuse
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((3L, Some(7L)), (4L, None))
        .toDF("id", "qty"), "append", p)
    }
    DeltaLog.write(Seq((3L, Some(7L)), (4L, Some(9L)))
      .toDF("id", "qty"), "append", p)
    assert(DeltaLog.read(spark, p).count() == 4L)
    // a FALSE row rejects the whole append, table unchanged
    val versionsBefore = commitVersions(p)
    val refusal = intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((5L, 1L), (6L, 0L), (7L, -1L)).toDF("id", "qty"),
        "append", p)
    }
    assert(refusal.getMessage.contains("2 row(s)"))
    assert(commitVersions(p) == versionsBefore)
    assert(DeltaLog.read(spark, p).count() == 4L)
    noStageLeak(p)
    // merge enforces too
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((8L, -2L, "x")).toDF("id", "qty", "note"),
        "merge", p)
    }
    assert(DeltaLog.read(spark, p).count() == 4L)
  }

  test("constraints survive overwrite (preserved configuration) and gate it") {
    val sp = spark; import sp.implicits._
    val p = freshDir("preserve")
    DeltaLog.write(Seq((1L, 5L)).toDF("id", "qty"), "overwrite", p,
      tableProperties = Map("delta.constraints.qty_pos" -> "qty > 0"))
    // overwrite without properties: configuration is preserved, so the
    // constraint gates the REPLACEMENT rows
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((9L, -1L)).toDF("id", "qty"), "overwrite", p)
    }
    assert(DeltaLog.read(spark, p).count() == 1L, "old table intact")
    DeltaLog.write(Seq((9L, 4L), (10L, 2L)).toDF("id", "qty"),
      "overwrite", p)
    // and still gates appends after the overwrite
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((11L, -7L)).toDF("id", "qty"), "append", p)
    }
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("NOT NULL invariant: declared non-nullable column rejects NULLs and absence") {
    val sp = spark
    val p = freshDir("notnull")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val rows = java.util.Arrays.asList(Row(1L, "a"), Row(2L, "b"))
    DeltaLog.write(sp.createDataFrame(rows, schema), "overwrite", p)
    // incoming frame is nullable and carries a NULL id → rejected
    val withNull = sp.createDataFrame(
      java.util.Arrays.asList(Row(3L, "c"), Row(null, "d")),
      StructType(Seq(
        StructField("id", LongType, nullable = true),
        StructField("s", StringType, nullable = true))))
    val err = intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(withNull, "append", p)
    }
    assert(err.getMessage.contains("NOT NULL invariant on id"))
    assert(DeltaLog.read(spark, p).count() == 2L)
    // frame missing the NOT NULL column entirely → typed refusal
    import sp.implicits._
    val noId = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq(("e")).toDF("s"), "append", p)
    }
    assert(noId.getMessage.contains("NOT NULL column"))
    // valid append passes
    DeltaLog.write(sp.createDataFrame(
      java.util.Arrays.asList(Row(3L, null)), schema), "append", p)
    assert(DeltaLog.read(spark, p).count() == 3L)
  }

  test("NOT NULL invariants recurse into nested struct fields") {
    val sp = spark
    val p = freshDir("notnull_nested")
    // addr is NULLABLE, addr.zip is NOT NULL: a NULL zip under a present
    // addr violates; a wholly-NULL addr does not (no value exists at the
    // nested path — delta-spark's invariants guard on the parent too)
    val inner = StructType(Seq(
      StructField("zip", StringType, nullable = false),
      StructField("city", StringType, nullable = true)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("addr", inner, nullable = true)))
    DeltaLog.write(sp.createDataFrame(
      java.util.Arrays.asList(Row(1L, Row("z1", "c1"))), schema),
      "overwrite", p)
    // nested NULL under a non-null parent → rejected, path named
    val relaxed = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("addr", StructType(Seq(
        StructField("zip", StringType, nullable = true),
        StructField("city", StringType, nullable = true))),
        nullable = true)))
    val err = intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(sp.createDataFrame(
        java.util.Arrays.asList(Row(2L, Row(null, "c2"))), relaxed),
        "append", p)
    }
    assert(err.getMessage.contains("NOT NULL invariant on addr.zip"))
    assert(DeltaLog.read(spark, p).count() == 1L)
    // NULL parent: nothing exists at addr.zip, nullable addr accepts it
    DeltaLog.write(sp.createDataFrame(
      java.util.Arrays.asList(Row(3L, null)), relaxed), "append", p)
    assert(DeltaLog.read(spark, p).count() == 2L)
    // frame whose struct LACKS the declared NOT NULL nested field →
    // typed refusal (rows would read back NULL at addr.zip)
    val noZip = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, nullable = true))),
        nullable = true)))
    val miss = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(sp.createDataFrame(
        java.util.Arrays.asList(Row(4L, Row("c4"))), noZip), "append", p)
    }
    assert(miss.getMessage.contains("addr.zip"))
    // a frame omitting the NULLABLE addr column ENTIRELY is legal —
    // every row reads addr NULL, so addr.zip has no value to violate
    // (delta-spark accepts the same write)
    val before = DeltaLog.read(spark, p).count()
    val idOnly = StructType(Seq(StructField("id", LongType, nullable = false)))
    DeltaLog.write(sp.createDataFrame(
      java.util.Arrays.asList(Row(5L)), idOnly), "append", p)
    assert(DeltaLog.read(spark, p).count() == before + 1)
    assert(DeltaLog.read(spark, p).where("id = 5 AND addr IS NULL")
      .count() == 1L)
  }

  test("upsert enforces constraints on the changeset") {
    val sp = spark; import sp.implicits._
    val p = freshDir("upsert")
    DeltaLog.write(Seq((1L, 5L), (2L, 3L)).toDF("id", "qty"),
      "overwrite", p,
      tableProperties = Map("delta.constraints.qty_pos" -> "qty > 0"))
    val err = intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.upsert(Seq((2L, -9L), (3L, 4L)).toDF("id", "qty"),
        Seq("id"), p)
    }
    assert(err.getMessage.contains("qty_pos"))
    assert(DeltaLog.read(spark, p).where("qty < 0").count() == 0L)
    DeltaLog.upsert(Seq((2L, 9L), (3L, 4L)).toDF("id", "qty"), Seq("id"), p)
    val back = DeltaLog.read(spark, p).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(back == Seq((1L, 5L), (2L, 9L), (3L, 4L)))
  }

  test("CHECK referencing a column absent from the frame refuses typed") {
    val sp = spark; import sp.implicits._
    val p = freshDir("absent")
    DeltaLog.write(Seq((1L, 5L, "a")).toDF("id", "qty", "name"),
      "overwrite", p,
      tableProperties = Map(
        "delta.constraints.named" -> "qty > 0 AND name IS NOT NULL"))
    // a frame lacking `name` would stage rows that read back NULL there —
    // the compound predicate flips FALSE on read, so refuse up front
    val err = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, 3L)).toDF("id", "qty"), "append", p)
    }
    assert(err.getMessage.contains("named"))
    assert(err.getMessage.contains("name"))
    // explicit NULL column validates honestly — and is correctly REJECTED
    // here because the constraint demands name IS NOT NULL
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(
        Seq((2L, 3L)).toDF("id", "qty")
          .withColumn("name", org.apache.spark.sql.functions
            .lit(null).cast("string")), "append", p)
    }
    DeltaLog.write(Seq((2L, 3L, "b")).toDF("id", "qty", "name"),
      "append", p)
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("nested CHECK constraints resolve their top-level column") {
    val sp = spark; import sp.implicits._
    val p = freshDir("nested")
    // `addr.zip IS NOT NULL` references frame column `addr` (head of the
    // name parts) — a .last-based extraction would demand a nonexistent
    // top-level `zip` and refuse every write on this table
    DeltaLog.write(
      Seq((1L, ("z1", "c1"))).toDF("id", "addr")
        .selectExpr("id", "named_struct('zip', addr._1, 'city', addr._2) AS addr"),
      "overwrite", p,
      tableProperties = Map("delta.constraints.zip_set" -> "addr.zip IS NOT NULL"))
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(
        Seq(2L).toDF("id")
          .selectExpr("id", "named_struct('zip', CAST(NULL AS STRING), 'city', 'c2') AS addr"),
        "append", p)
    }
    DeltaLog.write(
      Seq(3L).toDF("id")
        .selectExpr("id", "named_struct('zip', 'z3', 'city', 'c3') AS addr"),
      "append", p)
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("boolean properties and column presence are case-insensitive") {
    val sp = spark; import sp.implicits._
    val p = freshDir("caseins")
    // delta-spark parses booleans with toBoolean — "True" activates
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.appendOnly" -> "True"))
    intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.deleteWhere(spark, p, "id = 1")
    }
    // a declared NOT NULL `id` supplied as `ID` resolves like Spark does
    val p2 = freshDir("caseins2")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    DeltaLog.write(sp.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "a")), schema),
      "overwrite", p2)
    DeltaLog.write(Seq((2L, "b")).toDF("ID", "s"), "append", p2)
    assert(DeltaLog.read(spark, p2).count() == 2L)
  }

  test("bootstrap append over pre-existing parquet refuses constraints") {
    val sp = spark; import sp.implicits._
    val p = freshDir("bootstrap")
    Seq((1L, -5L)).toDF("id", "qty").write.mode("overwrite").parquet(p)
    // the adopted file's qty=-5 was never validated — declaring the
    // constraint over it would commit an invariant that never held
    val err = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, Some(3L))).toDF("id", "qty"), "append", p,
        tableProperties = Map("delta.constraints.qty_pos" -> "qty > 0"))
    }
    assert(err.getMessage.contains("bootstrapping"))
  }

  test("constraints survive the checkpoint fold") {
    val sp = spark; import sp.implicits._
    val p = freshDir("checkpointed")
    DeltaLog.write(Seq((0L, 1L)).toDF("id", "qty"), "overwrite", p,
      tableProperties = Map("delta.constraints.qty_pos" -> "qty > 0"),
      checkpointInterval = 2)
    (1 to 4).foreach { i =>
      DeltaLog.write(Seq((i.toLong, i.toLong)).toDF("id", "qty"),
        "append", p, checkpointInterval = 2)
    }
    assert(java.nio.file.Files.list(
        java.nio.file.Paths.get(p, "_delta_log"))
      .anyMatch(f => f.getFileName.toString.contains("checkpoint")),
      "fixture must actually checkpoint")
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(Seq((9L, -1L)).toDF("id", "qty"), "append", p,
        checkpointInterval = 2)
    }
    assert(DeltaLog.read(spark, p).count() == 5L)
  }
}
