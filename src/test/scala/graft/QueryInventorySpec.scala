package graft

import org.apache.spark.sql.types.{ArrayType, DateType, DecimalType, MapType}

/** Driver-comparator contract over the whole registered-query inventory:
  * the correctness harness lexsorts result columns with pandas, which
  * cannot factorize ArrayType/MapType cells (numpy arrays are unhashable —
  * this is exactly how s05 shipped red in round 5 despite a green local
  * check). Any query that needs an array internally must fold it to a
  * scalar fingerprint in the CHECKED projection, so a violation fails here
  * in `sbt test` instead of in a driver run.
  */
class QueryInventorySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query projects a top-level ArrayType/MapType column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] => s"$name.${f.name}"
        }
    }
    assert(offenders.isEmpty,
      s"driver comparator cannot sort these columns: ${offenders.mkString(", ")}")
  }

  test("no registered query projects a terminal DECIMAL or DATE column") {
    // the round-2 lesson: DECIMAL and DATE stringify differently across
    // the driver's two readers even when numerically equal (14 hash
    // mismatches, all terminal DECIMAL/DATE) — exact decimal results
    // must be rendered as plain strings at the query boundary
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] ||
            f.dataType == DateType => s"$name.${f.name}"
        }
    }
    assert(offenders.isEmpty,
      s"hash-unstable terminal types: ${offenders.mkString(", ")}")
  }

  test("every registered query ends in a global sort (the hash-compare total-order contract)") {
    // cross-engine hash comparison is only meaningful over a totally
    // ordered result; every query (and its oracle) must end in ORDER BY.
    // The analyzed plan's root region must contain a global Sort.
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, WithCTE}
    def topSorted(p: LogicalPlan): Boolean = p match {
      case s: Sort if s.global => true
      case w: WithCTE => topSorted(w.plan) // CTE defs are side children
      case _ if p.children.length == 1 => topSorted(p.children.head)
      case _ => false
    }
    val unsorted = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, q) if !topSorted(q(spark, sfDir).queryExecution.analyzed) => name
    }
    assert(unsorted.isEmpty, s"queries without a terminal sort: ${unsorted.mkString(", ")}")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("every registered query has an oracle (or a declared rows-only exemption)") {
    // forgetting the `oracles` map entry silently degrades a key to the
    // driver's weaker rows-only check (caught live once, on m08); only
    // genuinely non-SQL-expressible outputs may be exempt, and each
    // exemption must be deliberate — listed here with its reason
    // EMPTY since round 13: q26, the last exemption, now carries the q63
    // contract oracle (exact counts + within-tolerance booleans)
    val rowsOnlyByDesign = Set.empty[String]
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      rowsOnlyByDesign
    assert(unoracled.isEmpty,
      s"queries silently missing oracles: ${unoracled.mkString(", ")}")
  }

  test("every unpartitioned window runs over a bounded-by-construction frame") {
    // An unpartitioned WindowExec funnels its ENTIRE input through one
    // task — fine for a frame bounded by construction (a limit's heap, an
    // aggregate's group domain, a literal local relation), a scale-killer
    // for anything corpus-proportional (the round-7 seedCentroids flag).
    // This generalizes the q47/p09 plan pins: census the whole inventory
    // so no future operator reintroduces the shape. Asserted on the
    // pre-adaptive sparkPlan (AQE hides scans inside query stages).
    import org.apache.spark.sql.execution.{SparkPlan, LocalLimitExec,
      GlobalLimitExec, TakeOrderedAndProjectExec, LocalTableScanExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec}
    // the declared arithmetic-bin grouping columns whose domains are
    // bounded by a VALUE range, not the row count: p09's `slice` is
    // 10 quality deciles x CURR_HSLICES hash slices (≤40 values), q47's
    // `_sgr_*` are the null/NaN flags plus the clamped cent-quantized
    // bin of slicedGlobalRanks, t18's `decile` is
    // `x div (max div 10 + 1) + 1` with 0 ≤ x ≤ max, whose quotient is
    // in [0, 9] for any ids. Grouping on anything else (doc_id, a
    // text hash, ...) fails the census and needs its own bound argument.
    // p17's `_pps_bin` is `hash div 2^52` over the 60-bit hash domain —
    // ≤256 values by the VALUE range, the same class as `_sgr_bin`.
    // p24's `_shard_bin` is `least(tok div 64, 16383)` — clamped to a
    // ≤16,384-value domain by the VALUE range, same class as `_sgr_bin`.
    val boundedDomainCols = Set("slice", "_sgr_nn", "_sgr_nan", "_sgr_bin",
      "decile", "_pps_bin", "_ppl_bin", "_shard_bin")

    // STRUCTURAL recursion down the window's input, not an exists() over
    // the whole subtree: a limit sitting on a JOIN'S BUILD SIDE (e.g.
    // corpus.join(broadcast(dim.limit(10)))) bounds nothing about the
    // streamed corpus, yet exists() would find it and wave the window
    // through. A node bounds its output iff it IS a bound (limit /
    // literal frame / bounded-domain aggregate) or every
    // cardinality-carrying child is bounded (joins: BOTH sides — the
    // conservative choice; unions: all branches; other unary ops:
    // their child). Leaf file scans are corpus-proportional => false.
    def bounded(p: SparkPlan): Boolean = p match {
      case _: LocalLimitExec | _: GlobalLimitExec |
           _: TakeOrderedAndProjectExec => true // explicit row bound
      case _: LocalTableScanExec => true // literal golden frames
      // a GLOBAL aggregate is ≤1 row; a GROUPED aggregate is only as
      // bounded as its grouping domain — groupBy(doc_id) is corpus-
      // proportional (the exact round-7 shape this census exists to
      // catch), so grouped aggregates count only when every grouping
      // key is a declared arithmetic-bin column (cent-quantized /
      // modulo slice ids, domains bounded by the VALUE range, not the
      // row count).
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty ||
        a.groupingExpressions.forall {
          case att: org.apache.spark.sql.catalyst.expressions.Attribute =>
            boundedDomainCols.contains(att.name)
          case _ => false
        }
      case _ if p.children.nonEmpty => p.children.forall(bounded)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, sfDir).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
            s"$name: ${w.windowExpression.mkString(",").take(80)}"
        }
    }
    assert(offenders.isEmpty,
      s"corpus-proportional unpartitioned windows: ${offenders.mkString("; ")}")
  }

  test("README query counts match the registry (counts cannot rot)") {
    // round-13 verdict nit: README claimed "186 registered queries, 185
    // DuckDB-oracled" two rounds after the registry passed 200. Any
    // "N registered" or "N/N match" count in README must equal the live
    // registry size — update the doc WITH the registry or fail here.
    val n = SparkEntry.queries.size
    val readme = scala.io.Source.fromFile("README.md")("UTF-8").mkString
    val claims =
      "(\\d+) registered quer".r.findAllMatchIn(readme).map(_.group(1).toInt) ++
        "(\\d+)/(\\d+) match".r.findAllMatchIn(readme).flatMap(m =>
          Seq(m.group(1).toInt, m.group(2).toInt))
    val stale = claims.filter(_ != n).toSeq
    assert(stale.isEmpty,
      s"README count(s) ${stale.mkString(", ")} != registry size $n")
  }
}
