package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC pipeline semantics over the committed fixtures: op classification
  * from nullness, binlog-order latest state, duplicate-redelivery collapse,
  * DDL decision pipeline incl. the substring block-list quirks.
  */
class CdcPipelineSpec extends SparkSpec {

  test("op classification: nullness, not the op field (main.go:365-377)") {
    val counts = CdcPipeline.opCounts(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // acct: 7 inserts+updates+snapshot, txn: 3 (see fixtures/cdc_events.jsonl)
    assert(counts(("acct", "I")) == 7L) // incl. the P4 passthrough insert
    assert(counts(("acct", "U")) == 4L) // incl. snapshot r-event (before==after) and the duplicate
    assert(counts(("acct", "D")) == 1L)
    assert(counts(("txn", "I")) == 2L)
    assert(counts(("txn", "D")) == 1L)
  }

  test("latest state: binlog (file,pos,row) order wins over file order; deletes drop; re-insert survives") {
    val state = CdcPipeline.latestState(spark).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> (Option(r.getString(3)), r.getLong(4))).toMap
    // id=1: updated (duplicate redelivery collapsed)
    assert(state(("acct", 1L)) == (Some("alice2"), 150L))
    // id=2: deleted then re-inserted later in binlog => bob2
    assert(state(("acct", 2L)) == (Some("bob2"), 250L))
    // id=3: update at pos 30 beats insert at pos 20 despite file order
    assert(state(("acct", 3L)) == (Some("carol2"), 350L))
    // id=4: snapshot read
    assert(state(("acct", 4L)) == (Some("dave"), 400L))
    // txn id=1 deleted, id=2 alive
    assert(!state.contains(("txn", 1L)))
    assert(state(("txn", 2L))._2 == 22L)
    assert(state(("acct", 9L)) == (Some("gina"), 900L))
    assert(state.size == 8)
  }

  test("DDL decisions: block-list, whitelist, instance filter, empty guard") {
    val d = CdcPipeline.ddlDecisions(spark, Seq("acct", "txn"),
      reclaim = false, replaceAll = false).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(d(1L) == "apply")
    assert(d(2L) == "blocked") // CREATE DATABASE
    assert(d(3L) == "blocked") // DROP DATABASE
    assert(d(4L) == "blocked") // DROP TABLE, no reclaim
    assert(d(5L) == "skip_instance")
    assert(d(6L) == "skip_whitelist")
    assert(d(7L) == "error_empty")
    assert(d(8L) == "apply")
    assert(d(9L) == "blocked") // substring quirk: 'USE' inside comment text
  }

  test("DDL: reclaim allows DROP TABLE (config/config.go:15)") {
    val d = CdcPipeline.ddlDecisions(spark, Seq("acct", "txn"),
      reclaim = true, replaceAll = false).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(d(4L) == "apply")
  }

  test("DDL: replaceAll bypasses the whitelist (config/config.go:27)") {
    val d = CdcPipeline.ddlDecisions(spark, Seq("acct"),
      reclaim = false, replaceAll = true).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(d(6L) == "apply")
  }

  test("P4: query passthrough only when length > 5 (main.go:357-359)") {
    val q = CdcPipeline.changes(spark).filter(col("query").isNotNull)
      .select("id", "query").collect()
    assert(q.length == 1)
    assert(q.head.getLong(0) == 9L)
    assert(q.head.getString(1) == "INSERT INTO acct VALUES (9,'gina',900)")
  }

  test("P3: schema registry resolves logical types from the event schema tree") {
    import SchemaRegistry._
    val reg = SchemaRegistry.fromEvents(spark, "/root/repo/fixtures/cdc_typed_events.jsonl")
    val spec = reg(("shop", "pay"))
    assert(spec.map(c => c.name -> c.logicalType) == Seq(
      "id" -> PlainLong,
      "amount" -> ConnectDecimal(2),
      "paid_on" -> EpochDate,
      "created_at" -> EpochMillis(0),
      "active" -> BoolInt))
  }

  test("P3: schema evolution — a column added mid-stream decodes old and new rows") {
    // pre-ALTER events carry (id, name); the post-ALTER event carries
    // (id, name, added_at). The registry's per-batch rebuild must pick the
    // LATEST schema so old rows decode with null for the new column and
    // new rows decode its typed value — one run, both generations.
    def sectionJson(withNew: Boolean): String = {
      val extra = if (withNew)
        """,{"type":"int64","optional":true,"name":"io.debezium.time.Timestamp","field":"added_at"}"""
      else ""
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"string","optional":true,"field":"name"}$extra]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"string","optional":true,"field":"name"}$extra]}]}""".stripMargin.replace("\n", "")
    }
    def event(pos: Long, withNew: Boolean, after: String): String =
      s"""{"schema":${sectionJson(withNew)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay2","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val lines = Seq(
      event(10L, withNew = false, """{"id":1,"name":"a"}"""),
      event(20L, withNew = false, """{"id":2,"name":"b"}"""),
      event(30L, withNew = true,
        """{"id":1,"name":"a2","added_at":1587202401764}"""))
    val dir = java.nio.file.Files.createTempDirectory("evo")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    val spec = SchemaRegistry.fromEvents(spark, path.toString)(("shop", "pay2"))
    assert(spec.map(c => c.name -> c.logicalType) == Seq(
      "id" -> PlainLong, "name" -> PlainString, "added_at" -> EpochMillis(0)))

    val state = SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay2")
      .select(col("id"), col("name"), unix_millis(col("added_at")).as("ms"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    // id=1: post-ALTER update wins, typed new column decoded
    assert(state(1L) == ("a2", Some(1587202401764L)))
    // id=2: pre-ALTER row decodes through the widened schema with a null
    assert(state(2L) == ("b", None))
  }

  test("P3: schema evolution — a column DROPPED mid-stream decodes both generations") {
    // pre-ALTER events carry (id, name, legacy); the post-ALTER event
    // carries only (id, name). The latest tree must WIN (legacy gone from
    // the spec), and pre-ALTER row images decode through it by simply not
    // looking legacy up — the map-based image makes ALTER DROP a no-op
    // for old rows (the reference replays arbitrary ALTERs, main.go:87-88)
    def sectionJson(withLegacy: Boolean): String = {
      val legacy = if (withLegacy)
        """,{"type":"string","optional":true,"field":"legacy"}""" else ""
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"string","optional":true,"field":"name"}$legacy]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"string","optional":true,"field":"name"}$legacy]}]}""".stripMargin.replace("\n", "")
    }
    def event(pos: Long, withLegacy: Boolean, after: String): String =
      s"""{"schema":${sectionJson(withLegacy)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay3","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val lines = Seq(
      event(10L, withLegacy = true, """{"id":1,"name":"a","legacy":"x"}"""),
      event(20L, withLegacy = true, """{"id":2,"name":"b","legacy":"y"}"""),
      event(30L, withLegacy = false, """{"id":1,"name":"a2"}"""))
    val dir = java.nio.file.Files.createTempDirectory("evodrop")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    val spec = SchemaRegistry.fromEvents(spark, path.toString)(("shop", "pay3"))
    assert(spec.map(c => c.name -> c.logicalType) ==
      Seq("id" -> PlainLong, "name" -> PlainString))

    val state = SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay3")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a2", 2L -> "b"))
    // the dropped column is gone from the output schema entirely
    assert(SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay3")
      .schema.fieldNames.toSeq == Seq("id", "name"))
  }

  test("P3: schema evolution — a NARROWING type change is rejected loudly, not silently misdecoded") {
    // ALTER ... MODIFY code BIGINT on a string column: latest-tree
    // decoding would cast pre-ALTER images with string values to null
    // with no error. The checked registry must refuse the batch naming
    // the column and both types; a widening change must still pass.
    def sectionJson(codeType: String): String =
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"$codeType","optional":true,"field":"code"}]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"$codeType","optional":true,"field":"code"}]}]}""".stripMargin.replace("\n", "")
    def event(pos: Long, codeType: String, after: String): String =
      s"""{"schema":${sectionJson(codeType)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay6","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val narrowing = Seq(
      event(10L, "string", """{"id":1,"code":"A-7"}"""),
      event(20L, "int64", """{"id":2,"code":7}"""))
    val dir = java.nio.file.Files.createTempDirectory("evonarrow")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, narrowing.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    val v = SchemaRegistry.evolutionViolations(spark, path.toString)
    assert(v == Seq(EvolutionViolation("shop", "pay6", "code", PlainString, PlainLong)))
    val ex = intercept[IllegalStateException] {
      SchemaRegistry.fromEventsChecked(spark, path.toString)
    }
    assert(ex.getMessage.contains("shop.pay6.code") &&
      ex.getMessage.contains("narrowing"))

    // the mirror-image WIDENING change (int64 -> string) is admitted and
    // yields the latest tree
    val widening = Seq(
      event(10L, "int64", """{"id":1,"code":7}"""),
      event(20L, "string", """{"id":2,"code":"A-7"}"""))
    val wpath = dir.resolve("widen.jsonl")
    java.nio.file.Files.write(wpath, widening.mkString("\n").getBytes("UTF-8"))
    assert(SchemaRegistry.evolutionViolations(spark, wpath.toString).isEmpty)
    val spec = SchemaRegistry.fromEventsChecked(spark, wpath.toString)(("shop", "pay6"))
    assert(spec.map(c => c.name -> c.logicalType) ==
      Seq("id" -> PlainLong, "code" -> PlainString))

    // a REVERT sequence int64 -> string -> int64 hides the narrowing
    // from any distinct-tree scan (the second int64 tree IS the first);
    // adjacent-event comparison must still see the string -> int64 edge
    val revert = Seq(
      event(10L, "int64", """{"id":1,"code":7}"""),
      event(20L, "string", """{"id":2,"code":"A-7"}"""),
      event(30L, "int64", """{"id":3,"code":9}"""))
    val rpath = dir.resolve("revert.jsonl")
    java.nio.file.Files.write(rpath, revert.mkString("\n").getBytes("UTF-8"))
    assert(SchemaRegistry.evolutionViolations(spark, rpath.toString) ==
      Seq(EvolutionViolation("shop", "pay6", "code", PlainString, PlainLong)))
    intercept[IllegalStateException] {
      SchemaRegistry.fromEventsChecked(spark, rpath.toString)
    }

    // DROP then re-ADD at a narrower type: no adjacent tree pair shares
    // the column, but its consecutive OCCURRENCES narrow string -> int64
    // — the per-column compare must still reject it
    val idOnly =
      s"""{"schema":{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"}]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"}]}]},
         |"payload":{"before":null,"after":{"id":2},
         |"source":{"db":"shop","table":"pay6","file":"mysql-bin.000004","pos":20,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val dropAdd = Seq(
      event(10L, "string", """{"id":1,"code":"A-7"}"""),
      idOnly,
      event(30L, "int64", """{"id":3,"code":9}"""))
    val dpath = dir.resolve("dropadd.jsonl")
    java.nio.file.Files.write(dpath, dropAdd.mkString("\n").getBytes("UTF-8"))
    assert(SchemaRegistry.evolutionViolations(spark, dpath.toString) ==
      Seq(EvolutionViolation("shop", "pay6", "code", PlainString, PlainLong)))

    // and int64 -> double is NOT widening: longs above 2^53 change value
    val toDouble = Seq(
      event(10L, "int64", """{"id":1,"code":9007199254740993}"""),
      event(20L, "float64", """{"id":2,"code":1.5}"""))
    val fpath = dir.resolve("todouble.jsonl")
    java.nio.file.Files.write(fpath, toDouble.mkString("\n").getBytes("UTF-8"))
    assert(SchemaRegistry.evolutionViolations(spark, fpath.toString) ==
      Seq(EvolutionViolation("shop", "pay6", "code", PlainLong, PlainDouble)))
  }

  test("P3: schema evolution — bool -> int ALTER decodes pre-ALTER 'true'/'false' images, not null") {
    // isWidening whitelists BoolInt -> PlainLong, so the latest-tree
    // registry decodes pre-ALTER rows as PlainLong — but their row images
    // are the STRINGS 'true'/'false', which a bare cast("long") nulls:
    // exactly the silent misdecode the checked registry claims to reject.
    // The PlainLong decoder must be boolean-aware at DECODE level.
    def sectionJson(flagType: String): String =
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"$flagType","optional":true,"field":"flag"}]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"$flagType","optional":true,"field":"flag"}]}]}""".stripMargin.replace("\n", "")
    def event(pos: Long, flagType: String, after: String): String =
      s"""{"schema":${sectionJson(flagType)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay7","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val lines = Seq(
      event(10L, "boolean", """{"id":1,"flag":true}"""),
      event(20L, "boolean", """{"id":2,"flag":false}"""),
      event(30L, "int64", """{"id":3,"flag":7}"""))
    val dir = java.nio.file.Files.createTempDirectory("evoboolint")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    // admitted as widening...
    assert(SchemaRegistry.evolutionViolations(spark, path.toString).isEmpty)
    val spec = SchemaRegistry.fromEventsChecked(spark, path.toString)(("shop", "pay7"))
    assert(spec.map(c => c.name -> c.logicalType) ==
      Seq("id" -> PlainLong, "flag" -> PlainLong))
    // ...and pre-ALTER boolean images decode to 1/0, not null
    val state = SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay7")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(state == Map(1L -> Some(1L), 2L -> Some(0L), 3L -> Some(7L)))

    // ...and the registry carries the boolean PROVENANCE: the fallback
    // exists only for columns that actually lived through a bool->int
    // ALTER
    assert(spec.find(_.name == "flag").exists(_.boolGeneration))
    assert(!spec.find(_.name == "id").exists(_.boolGeneration))

    // the boolean fallback is EXACTLY 'true'/'false': Spark's boolean
    // cast also accepts 'y'/'yes'/'t'/'n'/'no'/'f', and routing garbage
    // through it would silently mint 1L/0L — garbage must fail the batch
    // loudly instead. Legitimate long renderings with sign/whitespace
    // ('+7', ' 7') must still decode — they did under the plain long
    // cast before the decoder was boolean-aware.
    import org.apache.spark.sql.functions.{map_from_arrays, lit, array}
    def decodeOne(img: String, boolGen: Boolean = true): Option[Long] = {
      val decoded = spark.range(1).select(
        SchemaRegistry.decodeImage(
          map_from_arrays(array(lit("flag")), array(lit(img))),
          Seq(SchemaRegistry.ColumnSpec("flag", PlainLong, boolGen))): _*)
      Option(decoded.head().get(0)).map(_.asInstanceOf[Long])
    }
    assert(decodeOne("+7") == Some(7L))
    assert(decodeOne(" 7") == Some(7L))
    assert(decodeOne("TRUE") == Some(1L))
    intercept[Exception] { decodeOne("y") }
    intercept[Exception] { decodeOne("yes") }
    intercept[Exception] { decodeOne("t") }
    // a column with NO boolean generation keeps the strict ANSI cast:
    // even a literal 'true' is garbage there and fails the batch loudly
    intercept[Exception] { decodeOne("true", boolGen = false) }
    assert(decodeOne("7", boolGen = false) == Some(7L))
  }

  test("P3: schema evolution — a decimal scale ALTER is rejected, not replayed") {
    // Debezium decimals are UNSCALED bytes: the value of an image depends
    // on the scale of the schema generation that WROTE it. Latest-tree
    // decoding of a pre-ALTER image under a grown scale divides every old
    // value by 10^(s2-s1) — 12345 @ scale 2 (123.45) silently becomes
    // 1.2345 at scale 4. So scale change in EITHER direction is narrowing
    // for this registry, and the checked path must refuse the batch.
    def sectionJson(scale: Int): String =
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"bytes","optional":true,
         |   "name":"org.apache.kafka.connect.data.Decimal",
         |   "parameters":{"scale":"$scale"},"field":"amount"}]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"bytes","optional":true,
         |   "name":"org.apache.kafka.connect.data.Decimal",
         |   "parameters":{"scale":"$scale"},"field":"amount"}]}]}""".stripMargin.replace("\n", "")
    def event(pos: Long, scale: Int, after: String): String =
      s"""{"schema":${sectionJson(scale)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay8","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    // the image VALUE is irrelevant to the guard — only the schema
    // parameters are compared
    val lines = Seq(
      event(10L, 2, """{"id":1,"amount":"MDk="}"""),
      event(20L, 4, """{"id":2,"amount":"MDk="}"""))
    val dir = java.nio.file.Files.createTempDirectory("evodecscale")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    assert(SchemaRegistry.evolutionViolations(spark, path.toString) ==
      Seq(EvolutionViolation("shop", "pay8", "amount",
        ConnectDecimal(2), ConnectDecimal(4))))
    val ex = intercept[IllegalStateException] {
      SchemaRegistry.fromEventsChecked(spark, path.toString)
    }
    assert(ex.getMessage.contains("shop.pay8.amount"))
    // an UNCHANGED decimal scale across generations stays admitted
    val same = Seq(
      event(10L, 2, """{"id":1,"amount":"MDk="}"""),
      event(20L, 2, """{"id":2,"amount":"MDk="}"""))
    val spath = dir.resolve("same.jsonl")
    java.nio.file.Files.write(spath, same.mkString("\n").getBytes("UTF-8"))
    assert(SchemaRegistry.evolutionViolations(spark, spath.toString).isEmpty)
  }

  test("P3: schema evolution — a column RENAMED mid-stream is drop+add under latest-tree decoding") {
    // ALTER ... RENAME COLUMN title TO headline: Debezium emits the new
    // name in post-ALTER schema sections, with no lineage to the old one
    // — so the latest tree sees a drop (title) plus an add (headline).
    // Pre-ALTER rows decode with headline = null (their images keyed the
    // OLD name); post-ALTER rows decode the value under the new name.
    // That null-for-old-generations contract is what makes the rename
    // replayable without rewriting history.
    def sectionJson(renamed: Boolean): String = {
      val c = if (renamed) "headline" else "title"
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"string","optional":true,"field":"$c"}]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"string","optional":true,"field":"$c"}]}]}""".stripMargin.replace("\n", "")
    }
    def event(pos: Long, renamed: Boolean, after: String): String =
      s"""{"schema":${sectionJson(renamed)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay5","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val lines = Seq(
      event(10L, renamed = false, """{"id":1,"title":"old one"}"""),
      event(20L, renamed = false, """{"id":2,"title":"old two"}"""),
      event(30L, renamed = true, """{"id":1,"headline":"new one"}"""))
    val dir = java.nio.file.Files.createTempDirectory("evorename")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    val spec = SchemaRegistry.fromEvents(spark, path.toString)(("shop", "pay5"))
    assert(spec.map(c => c.name -> c.logicalType) ==
      Seq("id" -> PlainLong, "headline" -> PlainString))

    val state = SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay5")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // id=1: post-rename update decodes under the new name and wins
    // id=2: only a pre-rename image exists -> headline is null
    assert(state == Map(1L -> Some("new one"), 2L -> None))
    assert(SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay5")
      .schema.fieldNames.toSeq == Seq("id", "headline"))
  }

  test("P3: schema evolution — int32 widened to int64 mid-stream decodes both generations") {
    // ALTER ... MODIFY amount BIGINT: pre-ALTER trees say int32, the
    // post-ALTER tree says int64. Latest-tree decoding reads BOTH
    // generations as long — including a post-ALTER value above 2^31
    def sectionJson(t: String): String =
      s"""{"type":"struct","fields":[
         |{"type":"struct","optional":true,"field":"before","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"$t","optional":true,"field":"amount"}]},
         |{"type":"struct","optional":true,"field":"after","fields":[
         |  {"type":"int64","optional":false,"field":"id"},
         |  {"type":"$t","optional":true,"field":"amount"}]}]}""".stripMargin.replace("\n", "")
    def event(pos: Long, t: String, after: String): String =
      s"""{"schema":${sectionJson(t)},"payload":{"before":null,"after":$after,
         |"source":{"db":"shop","table":"pay4","file":"mysql-bin.000004","pos":$pos,"row":0},
         |"op":"c","ts_ms":1}}""".stripMargin.replace("\n", "")
    val lines = Seq(
      event(10L, "int32", """{"id":1,"amount":100}"""),
      event(20L, "int32", """{"id":2,"amount":200}"""),
      event(30L, "int64", """{"id":1,"amount":3000000000}"""))
    val dir = java.nio.file.Files.createTempDirectory("evowiden")
    val path = dir.resolve("events.jsonl")
    java.nio.file.Files.write(path, lines.mkString("\n").getBytes("UTF-8"))

    import SchemaRegistry._
    val spec = SchemaRegistry.fromEvents(spark, path.toString)(("shop", "pay4"))
    assert(spec.map(c => c.name -> c.logicalType) ==
      Seq("id" -> PlainLong, "amount" -> PlainLong))

    val state = SchemaRegistry.typedLatestState(spark, path.toString, "shop", "pay4")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id=1: post-ALTER 64-bit value; id=2: pre-ALTER 32-bit row, widened
    assert(state == Map(1L -> 3000000000L, 2L -> 200L))
  }

  test("c08: planted duplicate coordinate and clock regression are both counted") {
    def ev(id: Int, pos: Int, ts: Long, del: Boolean = false): String = {
      val before = if (del) s"""{"id": $id}""" else "null"
      val after = if (del) "null" else s"""{"id": $id, "name": "x", "amount": 1}"""
      s"""{"payload": {"before": $before, "after": $after, "source": {"db": "shop", "table": "acct", "ts_ms": $ts, "file": "mysql-bin.000001", "pos": $pos, "row": 0, "query": null}, "ts_ms": $ts}}"""
    }
    val dir = java.nio.file.Files.createTempDirectory("c08").toString
    val path = s"$dir/events.jsonl"
    // pos 300 arrives with ts EARLIER than pos 200's (clock regression);
    // pos 200 is redelivered (duplicate coordinate)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), String.join("\n",
      ev(1, 100, 1000L), ev(2, 200, 2000L), ev(2, 200, 2000L),
      ev(3, 300, 1500L), ev(1, 400, 3000L, del = true)).getBytes)
    val out = CdcQueries.binlogAuditAt(spark, path).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 5 && r.getLong(3) == 4 && r.getLong(5) == 1,
      "5 events: 4 inserts + 1 delete")
    assert(r.getLong(6) == 4 && r.getLong(7) == 1, "one duplicate coordinate")
    assert(r.getLong(8) == 1, "exactly one wall-clock regression in log order")
    assert(r.getString(9) == "mysql-bin.000001:0000000100:00000")
    assert(r.getString(10) == "mysql-bin.000001:0000000400:00000")
  }

  test("P7: db qualifier strip (main.go:87)") {
    import spark.implicits._
    val df = Seq(("ALTER TABLE `shop`.txn MODIFY amount BIGINT", "shop"))
      .toDF("ddl", "db")
      .select(CdcPipeline.stripDbQualifier(col("ddl"), col("db")))
    assert(df.collect().head.getString(0) == "ALTER TABLE txn MODIFY amount BIGINT")
  }
}
