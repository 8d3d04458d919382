package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational query surface: the Layer-B semantics of the reference
 * (OracleConnectorSQL2.java:5-20 — projections, concat/coalesce, IN/BETWEEN predicates,
 * left-outer dictionary joins with dedup, MIN aggregates, UNION-distinct, LISTAGG,
 * ROW_NUMBER windows, MINUS, TO_NUMBER(REPLACE(...))) re-expressed as idiomatic DataFrame
 * programs over the TPC-H-ish testdata, plus TPC-H-style analytic queries that exercise the
 * general agg/join/window/sort surface a user of the reference's data would need.
 *
 * Cross-engine determinism rules (the DuckDB oracle hash-compares values):
 *   - money sums are computed in integer cents: `sum(cast(round(x*100) as long))` — exact,
 *     order-independent, bit-identical in both engines;
 *   - sums of doubles only over integral-valued columns (l_quantity);
 *   - timestamps are emitted as 'yyyy-MM-dd' strings, never raw;
 *   - every query ends in a total ORDER BY.
 *
 * Scale notes (100 TB posture): dimension sides (region, nation, filtered customer) are
 * broadcast; fact-fact joins shuffle on their natural keys; aggregates are partial
 * (map-side combine) by construction since they are Catalyst built-ins.
 */
object Relational {

  private def cents(c: Column): Column = Tables.cents(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TPC-H-style analytics -------------------------------------------------
    "q1_pricing" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_quantity" > 2.0)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum(cents($"l_extendedprice")).as("sum_base_cents"),
          sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_cents"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    // the DECIMAL-EXACT twin of q1_pricing (VERDICT r5 #4): the same aggregate computed in
    // DecimalType end to end — the correct-by-construction alternative SURVEY §1.2 names
    // next to the reference's NUMBER→double parity ladder (Catalog.oracleTypeToSpark).
    // Every step is exact integer-scaled arithmetic: cast to (12,2) at the scan,
    // (1.00 - disc) at scale 2, the product at scale 4, sums at the widened scale — no
    // float rounding anywhere, order-independent, and identical in any engine.
    "q1_pricing_decimal" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      // filter on the RAW column (selection is identical — values are exact 2-decimal
      // doubles) so the predicate pushes into the parquet scan; a filter on the cast
      // decimal would block pushdown and scan everything
      val li = Tables(s, dir, "lineitem")
        .filter($"l_quantity" > 2.0)
        .select($"l_returnflag", $"l_linestatus",
          $"l_quantity".cast(DecimalType(12, 2)).as("qty"),
          $"l_extendedprice".cast(DecimalType(12, 2)).as("price"),
          $"l_discount".cast(DecimalType(12, 2)).as("disc"))
      // every sum is exact decimal arithmetic; the final ×100 / ×10000 re-scales the exact
      // decimal onto a BIGINT wire type (the `cents` pattern used by every other money
      // query) so the oracle compare is dtype-stable — DuckDB's DECIMAL→pandas float64
      // conversion would otherwise hash-diverge on representation alone (r6 verdict #2)
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          (sum($"qty") * 100).cast("long").as("sum_qty_c2"),
          (sum($"price") * 100).cast("long").as("sum_base_c2"),
          (sum($"price" * (lit(BigDecimal(1)).cast(DecimalType(3, 2)) - $"disc")) * 10000)
            .cast("long").as("sum_disc_c4"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    "q3_topk_revenue" -> { (s, dir) =>
      import s.implicits._
      val customer = Tables(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val orders   = Tables(s, dir, "orders").filter($"o_orderdate" < lit("1999-01-01").cast("timestamp"))
      val lineitem = Tables(s, dir, "lineitem")
      lineitem
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(customer), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_cents"))
        .select($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("odate"),
          $"o_orderpriority", $"revenue_cents")
        .orderBy($"revenue_cents".desc, $"l_orderkey")
        .limit(10)
    },
    "q5_region_orders" -> { (s, dir) =>
      import s.implicits._
      val region = Tables(s, dir, "region").filter($"r_name".isin("ASIA", "EUROPE"))
      val nation = Tables(s, dir, "nation")
      val dims = broadcast(nation.join(broadcast(region), $"n_regionkey" === $"r_regionkey"))
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(dims, $"c_nationkey" === $"n_nationkey")
        .groupBy($"r_name", $"n_name")
        .agg(count(lit(1)).as("order_cnt"), sum(cents($"o_totalprice")).as("total_cents"))
        .orderBy($"r_name", $"n_name")
    },
    // q6: the classic scan-heavy filter + single aggregate — at 100 TB this is the query
    // whose entire cost is the scan, so pushed filters + column pruning decide everything
    "q6_forecast" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
        .agg(sum(cents($"l_extendedprice" * $"l_discount")).as("revenue_cents"),
          count(lit(1)).as("cnt"))
    },
    // CO-LOCATED (bucketed) fact-fact join — the shuffle-free join story for 100 TB:
    // both fact tables are written ONCE bucketed (and sorted) on their join key into a
    // session warehouse; a sort-merge join over the bucketed scans then needs NO exchange
    // on either side — at production scale that deletes the two largest shuffles of the
    // pipeline (re-materializing TBs over the network per run) in exchange for one
    // organize-on-write. The write happens on first use per (session, sf dir) and is
    // reused by every later call (exactly how a lake lays out fact tables once and joins
    // them forever); the hint("merge") pins SMJ so the plan proves colocation instead of
    // degenerating to a broadcast at test scale. PlanAuditSpec pins exchanges <= 2 (the
    // post-join aggregate + the final ORDER BY — NONE before the join).
    "q_bucketed_join" -> { (s, dir) =>
      import s.implicits._
      val oT = BucketedTables.ensure(s, dir, "orders", "o_orderkey")
      val lT = BucketedTables.ensure(s, dir, "lineitem", "l_orderkey")
      s.table(lT).hint("merge")
        .join(s.table(oT), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("line_cnt"),
          sum(cents($"l_extendedprice")).as("revenue_cents"))
        .orderBy($"o_orderstatus")
    },
    // q4-style LEFT SEMI join: orders having at least one returned lineitem — the EXISTS
    // shape; semi joins ship only the join key of the probe side (no fan-out, no payload)
    "q4_semi_join" -> { (s, dir) =>
      import s.implicits._
      val returned = Tables(s, dir, "lineitem")
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey")
      Tables(s, dir, "orders")
        .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_cnt"))
        .orderBy($"o_orderpriority")
    },
    // LEFT ANTI join: customers who never ordered — NOT EXISTS as a first-class plan
    // (except() in b9 is the distinct-set variant; anti join preserves cardinality)
    "q_anti_join" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("never_ordered_cnt"))
        .orderBy($"c_nationkey")
    },
    // ROLLUP: hierarchical subtotals in ONE pass (detail -> per-type -> grand total),
    // grouping_id disambiguates aggregation levels — the multi-granularity report shape
    "events_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type", ($"user_id" % 10).as("bucket"), $"value")
        .rollup($"event_type", $"bucket")
        .agg(count(lit(1)).as("cnt"), sum(cents($"value")).as("value_cents"),
          grouping_id().as("gid"))
        .select(coalesce($"event_type", lit("(all)")).as("etype"),
          coalesce($"bucket", lit(-1L)).as("bucket"),
          $"cnt", $"value_cents", $"gid")
        .orderBy($"gid", $"etype", $"bucket")
    },
    // CUBE: all four aggregation granularities of (event_type, bucket) in ONE pass —
    // rollup's hierarchy plus the per-bucket-across-types marginals; Spark expands the
    // grouping sets map-side so the fact is still scanned once and shuffled once
    "events_cube" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type", ($"user_id" % 10).as("bucket"), $"value")
        .cube($"event_type", $"bucket")
        .agg(count(lit(1)).as("cnt"), sum(cents($"value")).as("value_cents"),
          grouping_id().as("gid"))
        .select(coalesce($"event_type", lit("(all)")).as("etype"),
          coalesce($"bucket", lit(-1L)).as("bucket"),
          $"cnt", $"value_cents", $"gid")
        .orderBy($"gid", $"etype", $"bucket")
    },
    // EQUI-WIDTH HISTOGRAM: the profiling primitive behind range-partition planning and
    // data-quality dashboards — 10 fixed 50-unit bins (last bin open-ended) per event
    // type, with per-bin min/max as the bin-boundary evidence. Values go through the
    // shared integer-cents bridge so binning is pure integer division (bit-identical
    // cross-engine, no IEEE reliance). ONE hash-aggregate shuffle on (type, bin) — at
    // 100 TB the map-side partials collapse each partition to ≤ types×bins rows, so the
    // shuffle is constant-size regardless of input volume.
    "events_histogram" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type", cents($"value").as("vc"))
        .select($"event_type", least(expr("vc div 5000"), lit(9L)).cast("long").as("bucket"), $"vc")
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("cnt"), min($"vc").as("min_cents"), max($"vc").as("max_cents"))
        .orderBy($"event_type", $"bucket")
    },
    // WINDOW-FUNCTION breadth in one partition pass: lag/lead (neighbor access), ntile
    // (equi-depth banding), percent_rank/cume_dist (relative position). All six share ONE
    // window definition → Catalyst evaluates them in a single sort+window stage, one
    // shuffle on the partition key. Rank ratios are emitted in integer basis points: the
    // formulas ((rank-1)/(n-1), rank/n) are exact IEEE doubles from integer inputs, so
    // round(x*10000) is bit-identical across engines.
    "q_window_suite" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", cents($"o_totalprice").as("vc"))
        .select($"o_custkey", $"o_orderkey",
          row_number().over(w).as("rn"),
          coalesce(lag($"vc", 1).over(w), lit(-1L)).as("prev_cents"),
          coalesce(lead($"vc", 1).over(w), lit(-1L)).as("next_cents"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w) * 10000).cast("long").as("pr_bp"),
          round(cume_dist().over(w) * 10000).cast("long").as("cd_bp"))
        .orderBy($"o_custkey", $"rn")
    },
    // INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view refresh shape: a BASE
    // partial aggregate (the view, computed once over the historical fact) merges with a
    // small DELTA partial via unionAll + re-aggregate, because count/sum are algebraic
    // (mergeable partial states). At 100 TB this is THE pattern that turns a daily
    // full-fact rescan into a delta-sized one: the base partial is a few rows per group,
    // the delta shuffle is sized by the new data only. The oracle recomputes the full
    // aggregate flat — merge(base, delta) must equal it exactly (integer cents).
    "q_incremental_agg" -> { (s, dir) =>
      import s.implicits._
      def partial(df: DataFrame) = df
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum(cents($"o_totalprice")).as("total_cents"))
      val orders = Tables(s, dir, "orders")
      val base  = partial(orders.filter($"o_orderkey" % 7 =!= 0)) // the stored view
      val delta = partial(orders.filter($"o_orderkey" % 7 === 0)) // today's increment
      base.unionAll(delta)
        .groupBy($"o_orderstatus")
        .agg(sum($"cnt").as("cnt"), sum($"total_cents").as("total_cents"))
        .orderBy($"o_orderstatus")
    },
    // EXACT per-group discrete percentile + outlier flagging: the p99 threshold is the
    // value at ascending position ceil(0.99*n) WITHIN each event type (a value from the
    // set — no interpolation, so it is engine-exact in integer cents), and every event is
    // compared against its type's threshold. The full per-group sort is the exact path;
    // the sketch path of the same shape is percentile_approx (text_len_quantiles_approx)
    // when ±ε is acceptable at lake scale.
    // SINGLE-PASS plan: the threshold is computed by a second window over the SAME
    // type-partitioning (rank → pick → broadcast-within-partition via an unbounded max) —
    // one fact scan, one shuffle; the join formulation would scan the fact twice and
    // shuffle the threshold back in. PlanAuditSpec pins join-free + one scan.
    "events_anomaly_p99" -> { (s, dir) =>
      import s.implicits._
      val wOrd = Window.partitionBy($"event_type").orderBy($"vc")
      val wAll = Window.partitionBy($"event_type")
      Tables(s, dir, "events")
        .select($"event_type", cents($"value").as("vc"))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("p99_cents",
          max(when($"rn" === ceil($"n" * 0.99), $"vc")).over(wAll))
        .groupBy($"event_type")
        .agg(max($"p99_cents").as("p99_cents"),
          count(when($"vc" > $"p99_cents", 1)).as("outlier_cnt"),
          sum(when($"vc" > $"p99_cents", $"vc")).as("outlier_cents"))
        .orderBy($"event_type")
    },
    // INTERSECT: customers holding BOTH open and finished orders — the set operator b9's
    // except() leaves uncovered
    "q_intersect" -> { (s, dir) =>
      import s.implicits._
      val open = Tables(s, dir, "orders").filter($"o_orderstatus" === "O").select($"o_custkey")
      val done = Tables(s, dir, "orders").filter($"o_orderstatus" === "F").select($"o_custkey")
      open.intersect(done)
        .agg(count(lit(1)).as("both_cnt"), min($"o_custkey").as("min_k"), max($"o_custkey").as("max_k"))
    },
    // SEMI-STRUCTURED extraction: the `props` JSON payload parsed in the scan stage
    // (`from_json` with an explicit schema — codegen'd, no UDF, evaluated once per row)
    // and aggregated. The lake-engine JSON path: schema-on-read over a string column,
    // projection pushed to the scan so only (event_type, props) are ever read; at 100 TB
    // the parse is embarrassingly parallel map-side work feeding one hash aggregate.
    "events_json_extract" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select($"event_type",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("cnt"),
          sum($"k").cast("long").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"),
          count(when($"k".isNull, 1)).as("null_k_cnt"))
        .orderBy($"event_type")
    },
    // PIVOT: event counts and cents per user bucket, one column per event type — the wide
    // report shape; Spark's pivot aggregates once and lays columns out without a join
    "events_pivot" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select(($"user_id" % 10).as("bucket"), $"event_type", $"value")
        .groupBy($"bucket")
        .pivot($"event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)).as("cnt"), sum(cents($"value")).as("cents"))
        .na.fill(0L) // empty cells: Spark pivot yields null, the oracle coalesces to 0
        .orderBy($"bucket")
    },
    // ---- Layer B reproductions -------------------------------------------------
    // B1 (SQL:5): projection + `||` concat xid + NVL/coalesce + OPERATION_CODE IN (...)
    "b1_scan_project" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .filter($"event_type".isin("click", "view", "purchase") && $"event_id" >= 100)
        .select(
          concat_ws(".", $"user_id", $"event_id").as("xid"),
          coalesce($"value", lit(0.0)).as("val"),
          $"event_type", $"event_id")
        .orderBy($"event_id")
    },
    // B2 (SQL:6): compound boolean predicate algebra ((a AND b) OR (c AND d)), NOT IN
    "b2_predicate_scan" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .filter(
          ($"event_id" > 500 && $"event_type".isin("signup", "error") && !$"user_id".isin(1L, 2L, 3L)) ||
          ($"event_type".isin("click", "purchase") && $"value" > 300.0))
        .select($"event_id", $"user_id", $"event_type")
        .orderBy($"event_id")
    },
    // B3 (SQL:13): main LEFT OUTER JOIN (grouped dedup CTE) LEFT OUTER JOIN (join CTE),
    // NVL defaults, filter, ORDER BY — the dictionary query shape.
    "b3_dictionary_join" -> { (s, dir) =>
      import s.implicits._
      val dcc = Tables(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("order_cnt"), max($"o_totalprice").as("max_price"))
      val duq = Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"r_name")
      Tables(s, dir, "customer")
        .join(dcc, $"c_custkey" === $"o_custkey", "left_outer")
        .join(broadcast(duq), $"c_nationkey" === $"n_nationkey", "left_outer")
        .filter($"c_acctbal" > 0)
        .select($"c_custkey", $"c_name",
          coalesce($"order_cnt", lit(0L)).as("order_cnt"),
          coalesce($"max_price", lit(0.0)).as("max_price"),
          coalesce($"r_name", lit("NONE")).as("region_name"))
        .orderBy($"c_custkey")
    },
    // B4 (SQL:15): B3 with CON_ID added to every join key — composite-key left joins
    "b4_dictionary_join_cdb" -> { (s, dir) =>
      import s.implicits._
      val dcc = Tables(s, dir, "orders")
        .groupBy($"o_custkey", $"o_orderstatus")
        .agg(count(lit(1)).as("order_cnt"), max($"o_totalprice").as("max_price"))
      val duq = Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_regionkey", $"r_name")
      Tables(s, dir, "customer")
        .join(dcc, $"c_custkey" === $"o_custkey" && $"o_orderstatus" === "O", "left_outer")
        .join(broadcast(duq),
          $"c_nationkey" === $"n_nationkey" && $"n_regionkey" === $"c_nationkey" % 5, "left_outer")
        .filter($"c_acctbal" > 0)
        .select($"c_custkey",
          coalesce($"order_cnt", lit(0L)).as("open_order_cnt"),
          coalesce($"max_price", lit(0.0)).as("max_open_price"),
          coalesce($"r_name", lit("NONE")).as("region_name"))
        .orderBy($"c_custkey")
    },
    // B3 (SQL:13) FAITHFUL dcc/duq shape: dba_tab_cols LEFT OUTER JOIN
    // (constraints ⋈ cons_columns, type='P') LEFT OUTER JOIN
    // (ind_columns ⋈ indexes, uniqueness='UNIQUE', GROUP BY dedup), NVL'd pk/uq flags,
    // HIDDEN/VIRTUAL filters, ORDER BY (table_name, column_id) — the per-column PK/UQ
    // dictionary the reference loads into models/Column.java:19-20 and we carry as
    // StructField.metadata (graft.cdc.Catalog.withKeyMetadata). Dictionary tables are
    // synthesized deterministically from supplier; both dcc and duq are tiny dimension
    // sides (auto-broadcast; at scale the dictionary is always broadcast-able).
    "b3_dictionary_pkuq" -> { (s, dir) =>
      import s.implicits._
      val sup = Tables(s, dir, "supplier").select($"s_suppkey".cast("long").as("k"))
      val tabCols = sup.select(
        lit("GRAFT").as("owner"),
        concat_ws("", lit("T"), $"k" % 10).as("table_name"),
        concat_ws("", lit("C"), $"k").as("column_name"),
        $"k".as("column_id"),
        when($"k" % 13 === 0, "YES").otherwise("NO").as("hidden_column"),
        when($"k" % 17 === 0, "YES").otherwise("NO").as("virtual_column"))
      val hasCons = $"k" % 7 === 0 || $"k" % 11 === 0
      val consName =
        when($"k" % 7 === 0, concat_ws("", lit("PK_"), $"k"))
          .otherwise(concat_ws("", lit("CK_"), $"k"))
      val constraints = sup.filter(hasCons).select(
        lit("GRAFT").as("owner"), consName.as("constraint_name"),
        concat_ws("", lit("T"), $"k" % 10).as("table_name"),
        when($"k" % 7 === 0, "P").otherwise("C").as("constraint_type"))
      val consCols = sup.filter(hasCons).select(
        lit("GRAFT").as("owner"), consName.as("constraint_name"),
        concat_ws("", lit("T"), $"k" % 10).as("table_name"),
        concat_ws("", lit("C"), $"k").as("column_name"))
      // every %15 column sits in TWO unique indexes -> duq's GROUP BY dedup is exercised
      val indCols = sup.filter($"k" % 5 === 0).select(
          lit("GRAFT").as("table_owner"), concat_ws("", lit("IX_"), $"k").as("index_name"),
          concat_ws("", lit("T"), $"k" % 10).as("table_name"),
          concat_ws("", lit("C"), $"k").as("column_name"))
        .unionAll(sup.filter($"k" % 15 === 0).select(
          lit("GRAFT").as("table_owner"), concat_ws("", lit("IX2_"), $"k").as("index_name"),
          concat_ws("", lit("T"), $"k" % 10).as("table_name"),
          concat_ws("", lit("C"), $"k").as("column_name")))
      val indexes = sup.filter($"k" % 5 === 0).select(
          lit("GRAFT").as("owner"), concat_ws("", lit("IX_"), $"k").as("index_name"),
          when($"k" % 20 === 0, "NONUNIQUE").otherwise("UNIQUE").as("uniqueness"))
        .unionAll(sup.filter($"k" % 15 === 0).select(
          lit("GRAFT").as("owner"), concat_ws("", lit("IX2_"), $"k").as("index_name"),
          lit("UNIQUE").as("uniqueness")))
      // the join/dedup/NVL shape itself is the SHARED production path
      // (graft.cdc.Catalog.pkUqDictionary): the same plan that loads key metadata for the
      // merge operators (cdc_apply_merge_dict) is what the oracle gates here
      graft.cdc.Catalog.pkUqDictionary(tabCols, constraints, consCols, indCols, indexes)
    },
    // B5 (SQL:11): global MIN aggregate
    "b5_min_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .agg(min($"event_id").as("min_id"), max($"event_id").as("max_id"),
          count(lit(1)).as("cnt"))
    },
    // B6 (SQL:12): UNION (distinct) of two BETWEEN-filtered subqueries, then MIN
    "b6_union_distinct_min" -> { (s, dir) =>
      import s.implicits._
      val s1 = Tables(s, dir, "orders").filter($"o_orderkey".between(100L, 5000L)).select($"o_custkey".as("k"))
      val s2 = Tables(s, dir, "orders").filter($"o_totalprice".between(1000.0, 50000.0)).select($"o_custkey".as("k"))
      s1.union(s2).distinct()
        .agg(min($"k").as("min_k"), max($"k").as("max_k"), count(lit(1)).as("cnt"))
    },
    // B7 (SQL:17): LISTAGG WITHIN GROUP (ORDER BY) == concat_ws over sorted collect_list
    "b7_listagg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(concat_ws(" ", array_sort(collect_list($"n_name"))).as("nations"),
          count(lit(1)).as("nation_cnt"))
        .orderBy($"r_name")
    },
    // B7 (SQL:17) full shape in ONE query: LISTAGG-within-group + UNION ALL of two
    // branches + ROW_NUMBER window + NVL/DECODE + MINUS — the log-file discovery query.
    "b7_full_logfiles" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"grp").orderBy($"o_orderkey".desc)
      val archived = Tables(s, dir, "orders")
        .filter($"o_orderstatus" === "F")
        .select($"o_orderkey", ($"o_custkey" % 10).as("grp"), lit("ARCHIVED").as("kind"))
      val online = Tables(s, dir, "orders")
        .filter($"o_orderstatus" === "O")
        .select($"o_orderkey", ($"o_custkey" % 10).as("grp"),
          when($"o_totalprice" > 250000.0, "BIG").otherwise("SMALL").as("kind"))
      val registered = Tables(s, dir, "orders")
        .filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey", ($"o_custkey" % 10).as("grp"))
      // cached: `latest` feeds both the except() side and the re-join — without it the
      // union+window subplan executes twice (round-2 plan audit)
      val latest = archived.unionAll(online)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .cache()
      latest.select($"o_orderkey", $"grp").except(registered)
        .join(latest, Seq("o_orderkey", "grp"))
        .groupBy($"grp")
        .agg(concat_ws(" ", transform(array_sort(collect_list($"o_orderkey")), _.cast("string"))).as("names"),
          coalesce(max(when($"kind" === "BIG", $"o_orderkey")), lit(-1L)).as("max_big"),
          count(lit(1)).as("cnt"))
        .orderBy($"grp")
    },
    // B7/B8 (SQL:17-19): ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...) = 1
    "b8_window_rownum" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_custkey", $"o_orderkey".as("latest_orderkey"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("latest_date"))
        .orderBy($"o_custkey")
    },
    // B7/B9 (SQL:17,20): MINUS == except — custkeys that never placed a >400k order
    "b9_except" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "customer").select($"c_custkey".as("custkey"))
        .except(Tables(s, dir, "orders").filter($"o_totalprice" > 400000.0).select($"o_custkey".as("custkey")))
        .orderBy($"custkey")
    },
    // event-time tumbling-window aggregation over the events stream table (the batch
    // analogue of the Structured Streaming watermark+window path; ts is nanos-since-epoch)
    "events_window_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .select(expr("ts div 60000000000").as("minute_bucket"), $"event_type", $"value")
        .groupBy($"minute_bucket", $"event_type")
        .agg(count(lit(1)).as("event_cnt"),
          sum(cents($"value")).as("value_cents"))
        .orderBy($"minute_bucket", $"event_type")
        .limit(500)
    },
    // exact distinct cardinality per event type — the ground-truth pair of the HLL query
    // below; count_distinct shuffles the (type, user) pairs once, pre-deduped map-side
    "events_distinct_users" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(count_distinct($"user_id").as("uniq_users"))
        .orderBy($"event_type")
    },
    // the SKETCH path: approx_count_distinct's HyperLogLog++ — one pass, mergeable
    // fixed-size registers, no distinct-pair shuffle at all: the lake-scale default when
    // ±rsd is acceptable. A sketch is not bit-exact → rows/schema gate only; the
    // SketchSpec suite asserts the estimate lands within the HLL error bound of the exact
    // events_distinct_users answer.
    "events_distinct_users_approx" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", rsd = 0.02).as("uniq_users"))
        .orderBy($"event_type")
    },
    // B10 (SQL:14): TO_NUMBER(REPLACE(version,'.','')) — build a version string, strip, cast
    "b10_version_parse" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey",
          concat_ws(".", $"o_orderkey" % 10, $"o_custkey" % 100, lit(0)).as("version"))
        .withColumn("ver_num", regexp_replace($"version", "\\.", "").cast("long"))
        .orderBy($"o_orderkey")
        .limit(100)
    },
    // PAGERANK (3 unrolled iterations, damping 85/100, INTEGER-scaled so the hash gate
    // holds) over the bipartite user↔topic graph distilled from events (`props.k` is the
    // topic a user touched). This is the OTHER iterative-graph shape beyond the
    // components' label propagation: per-round rank mass flows along edges
    // (join → div by out-degree → sum by destination), then the damped update. Integer
    // division floors identically in both engines and the per-destination sum is
    // order-independent, so three rounds stay bit-exact. Scale posture: each round is
    // one equi shuffle join (edges ⋈ ranks on the node key) + one partial-aggregated
    // sum — the standard distributed PageRank step; edges carry their out-degree from a
    // cached one-pass build, and the loop depth is a fixed constant (plan unrolls, no
    // driver-side data movement).
    "graph_pagerank" -> { (s, dir) =>
      import s.implicits._
      // Tables.par: the JSON parse + distinct otherwise runs on the single scan split
      // (r20 profile: a 1.3 s one-task stage). raw and deg are LOOP INVARIANTS: every
      // round's broadcast build re-derived scan→parse→distinct→degree without the
      // caches (measured r20: the 1.3 s stage ran once per round per action — 3× per
      // execution); released by the bench's post-rep sweep like the other cached
      // builders (dedup_ngram_jaccard precedent).
      val raw = Tables.par(s, dir, "events")
        .select($"user_id",
          from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .filter($"k".isNotNull)
        .select($"user_id".as("u"), $"k").distinct().cache()
      val edges = raw
        .select(lit("u").as("sk"), $"u".as("sid"), lit("k").as("dk"), $"k".as("did"))
        .unionByName(raw
          .select(lit("k").as("sk"), $"k".as("sid"), lit("u").as("dk"), $"u".as("did")))
      val deg = edges.groupBy($"sk", $"sid").agg(count(lit(1)).as("deg")).cache()
      val ed = edges.join(deg, Seq("sk", "sid")).cache()
      val nodes = deg.select($"sk".as("kind"), $"sid".as("id"))
      var ranks = nodes.select($"kind", $"id", lit(PrScale).as("r"))
      // 3 rounds BY DESIGN (plan unrolls; lineage depth is a constant). If this ever
      // becomes iterate-to-convergence, adopt Dedup.propagateLabels' per-round
      // localCheckpoint + block-release pattern first — an unbounded unrolled lineage
      // re-derives every prior round per action and blows the planner at depth.
      for (_ <- 1 to 3) {
        val contrib = ed
          .join(ranks, ed("sk") === ranks("kind") && ed("sid") === ranks("id"))
          .select($"dk".as("kind"), $"did".as("id"), expr("r div deg").as("c"))
          .groupBy($"kind", $"id").agg(sum($"c").as("c"))
        // damped update in an overflow-safe split: for c >= 0,
        //   (85*c) div 100  ==  (c div 100)*85 + ((c % 100)*85) div 100
        // (c = 100q+rem → 85c = 8500q + 85rem), so the largest intermediate is
        // 0.85*c instead of 85*c — a hub's aggregated in-flow stays in Long range
        // until total rank mass itself would overflow (~9e18, ≈9M nodes at PrScale),
        // not at the ~1.1e17 in-flow where 85*c wrapped silently.
        ranks = nodes.join(contrib, Seq("kind", "id"), "left_outer")
          .select($"kind", $"id",
            (lit(PrScale * 15L / 100L) +
              expr("(coalesce(c, 0L) div 100) * 85 + ((coalesce(c, 0L) % 100) * 85) div 100"))
              .as("r"))
      }
      ranks.select($"kind", $"id", $"r".as("rank")).orderBy($"kind", $"id")
    },
  )

  /** Integer rank scale of `graph_pagerank` (1 unit of PageRank mass = 1e12) —
    * shared with the oracle so the gates cannot drift. */
  private val PrScale = 1000000000000L

  val oracle: Map[String, String] = Map(
    // the same three damped rounds unrolled as CTEs; // floors like Spark's div on the
    // non-negative rank mass
    "graph_pagerank" -> {
      val base = PrScale * 15L / 100L
      def round(prev: String, cur: String) =
        s"""c$cur AS (SELECT dk AS kind, did AS id, cast(sum(r.r // ed.deg) AS BIGINT) AS c
           |  FROM ed JOIN r$prev r ON r.kind = ed.sk AND r.id = ed.sid GROUP BY dk, did),
           |r$cur AS (SELECT n.kind, n.id,
           |    cast($base + (coalesce(c$cur.c, 0) // 100) * 85
           |           + ((coalesce(c$cur.c, 0) % 100) * 85) // 100 AS BIGINT) AS r
           |  FROM n LEFT JOIN c$cur ON n.kind = c$cur.kind AND n.id = c$cur.id)""".stripMargin
      s"""WITH raw AS (SELECT DISTINCT user_id AS u, (props->>'k')::BIGINT AS k
         |  FROM events WHERE (props->>'k') IS NOT NULL),
         |e AS (SELECT 'u' AS sk, u AS sid, 'k' AS dk, k AS did FROM raw
         |      UNION ALL SELECT 'k', k, 'u', u FROM raw),
         |deg AS (SELECT sk, sid, cast(count(*) AS BIGINT) AS deg FROM e GROUP BY sk, sid),
         |ed AS (SELECT e.sk, e.sid, e.dk, e.did, deg.deg FROM e JOIN deg USING (sk, sid)),
         |n AS (SELECT sk AS kind, sid AS id FROM deg),
         |r0 AS (SELECT kind, id, cast($PrScale AS BIGINT) AS r FROM n),
         |${round("0", "1")},
         |${round("1", "2")},
         |${round("2", "3")}
         |SELECT kind, id, r AS rank FROM r3 ORDER BY kind, id""".stripMargin
    },
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | cast(sum(cast(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        | cast(sum(cast(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        | min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        | cast(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_quantity > 2.0
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q1_pricing_decimal" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(qty) * 100 AS BIGINT) AS sum_qty_c2,
        | cast(sum(price) * 100 AS BIGINT) AS sum_base_c2,
        | cast(sum(price * (1.00 - disc)) * 10000 AS BIGINT) AS sum_disc_c4,
        | cast(count(*) AS BIGINT) AS count_order
        |FROM (SELECT l_returnflag, l_linestatus,
        |        cast(l_quantity AS DECIMAL(12,2)) AS qty,
        |        cast(l_extendedprice AS DECIMAL(12,2)) AS price,
        |        cast(l_discount AS DECIMAL(12,2)) AS disc
        |      FROM lineitem WHERE l_quantity > 2.0)
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority,
        | cast(sum(cast(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_orders" ->
      """SELECT r_name, n_name, cast(count(*) AS BIGINT) AS order_cnt,
        | cast(sum(cast(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA','EUROPE')
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_intersect" ->
      """SELECT cast(count(*) AS BIGINT) AS both_cnt, min(o_custkey) AS min_k, max(o_custkey) AS max_k
        |FROM (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |      INTERSECT
        |      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin,
    "events_json_extract" ->
      """WITH e AS (SELECT event_type, (props->>'k')::INTEGER AS k FROM events)
        |SELECT event_type, cast(count(*) AS BIGINT) AS cnt,
        | cast(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        | cast(count(CASE WHEN k IS NULL THEN 1 END) AS BIGINT) AS null_k_cnt
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_pivot" ->
      """SELECT user_id % 10 AS bucket,
        | cast(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_cnt,
        | cast(coalesce(sum(cast(round(value*100) AS BIGINT)) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS click_cents,
        | cast(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_cnt,
        | cast(coalesce(sum(cast(round(value*100) AS BIGINT)) FILTER (WHERE event_type = 'view'), 0) AS BIGINT) AS view_cents,
        | cast(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_cnt,
        | cast(coalesce(sum(cast(round(value*100) AS BIGINT)) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchase_cents
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q6_forecast" ->
      """SELECT cast(sum(cast(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | cast(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin,
    // the bucketed layout changes the PLAN, never the relation: the oracle is the plain join
    "q_bucketed_join" ->
      """SELECT o_orderstatus, cast(count(*) AS BIGINT) AS line_cnt,
        | cast(sum(cast(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, cast(count(*) AS BIGINT) AS order_cnt
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_anti_join" ->
      """SELECT c_nationkey, cast(count(*) AS BIGINT) AS never_ordered_cnt
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "events_cube" ->
      """SELECT coalesce(event_type, '(all)') AS etype,
        | coalesce(user_id % 10, -1) AS bucket,
        | cast(count(*) AS BIGINT) AS cnt,
        | cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        | cast(GROUPING(event_type, user_id % 10) AS BIGINT) AS gid
        |FROM events
        |GROUP BY CUBE(event_type, user_id % 10)
        |ORDER BY gid, etype, bucket""".stripMargin,
    "events_histogram" ->
      """WITH v AS (SELECT event_type, cast(round(value*100) AS BIGINT) AS vc FROM events)
        |SELECT event_type, cast(least(vc // 5000, 9) AS BIGINT) AS bucket,
        |  cast(count(*) AS BIGINT) AS cnt, min(vc) AS min_cents, max(vc) AS max_cents
        |FROM v GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "q_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        | cast(row_number() OVER w AS INTEGER) AS rn,
        | coalesce(lag(vc, 1) OVER w, -1) AS prev_cents,
        | coalesce(lead(vc, 1) OVER w, -1) AS next_cents,
        | cast(ntile(4) OVER w AS INTEGER) AS quartile,
        | cast(round(percent_rank() OVER w * 10000) AS BIGINT) AS pr_bp,
        | cast(round(cume_dist() OVER w * 10000) AS BIGINT) AS cd_bp
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        cast(round(o_totalprice*100) AS BIGINT) AS vc FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_incremental_agg" ->
      """SELECT o_orderstatus, cast(count(*) AS BIGINT) AS cnt,
        | cast(sum(cast(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "events_anomaly_p99" ->
      """WITH ev AS (SELECT event_type, cast(round(value*100) AS BIGINT) AS vc FROM events),
        |ranked AS (SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |thresholds AS (SELECT event_type, vc AS p99_cents FROM ranked
        |  WHERE rn = cast(ceil(n * 0.99) AS BIGINT))
        |SELECT ev.event_type, max(p99_cents) AS p99_cents,
        |  cast(count(CASE WHEN vc > p99_cents THEN 1 END) AS BIGINT) AS outlier_cnt,
        |  cast(sum(CASE WHEN vc > p99_cents THEN vc END) AS BIGINT) AS outlier_cents
        |FROM ev JOIN thresholds USING (event_type)
        |GROUP BY ev.event_type ORDER BY event_type""".stripMargin,
    "events_rollup" ->
      """SELECT coalesce(event_type, '(all)') AS etype,
        | coalesce(user_id % 10, -1) AS bucket,
        | cast(count(*) AS BIGINT) AS cnt,
        | cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        | cast(GROUPING(event_type, user_id % 10) AS BIGINT) AS gid
        |FROM events
        |GROUP BY ROLLUP(event_type, user_id % 10)
        |ORDER BY gid, etype, bucket""".stripMargin,
    "b1_scan_project" ->
      """SELECT concat_ws('.', user_id, event_id) AS xid, coalesce(value, 0.0) AS val,
        | event_type, event_id
        |FROM events
        |WHERE event_type IN ('click','view','purchase') AND event_id >= 100
        |ORDER BY event_id""".stripMargin,
    "b2_predicate_scan" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE (event_id > 500 AND event_type IN ('signup','error') AND user_id NOT IN (1,2,3))
        |   OR (event_type IN ('click','purchase') AND value > 300.0)
        |ORDER BY event_id""".stripMargin,
    "b3_dictionary_join" ->
      """WITH dcc AS (SELECT o_custkey, cast(count(*) AS BIGINT) AS order_cnt, max(o_totalprice) AS max_price
        |             FROM orders GROUP BY o_custkey),
        |     duq AS (SELECT n_nationkey, r_name FROM nation JOIN region ON n_regionkey = r_regionkey)
        |SELECT c_custkey, c_name, coalesce(order_cnt, 0) AS order_cnt,
        |  coalesce(max_price, 0.0) AS max_price, coalesce(r_name, 'NONE') AS region_name
        |FROM customer LEFT JOIN dcc ON c_custkey = o_custkey
        |  LEFT JOIN duq ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "b4_dictionary_join_cdb" ->
      """WITH dcc AS (SELECT o_custkey, o_orderstatus, cast(count(*) AS BIGINT) AS order_cnt,
        |                    max(o_totalprice) AS max_price
        |             FROM orders GROUP BY o_custkey, o_orderstatus),
        |     duq AS (SELECT n_nationkey, n_regionkey, r_name
        |             FROM nation JOIN region ON n_regionkey = r_regionkey)
        |SELECT c_custkey, coalesce(order_cnt, 0) AS open_order_cnt,
        |  coalesce(max_price, 0.0) AS max_open_price, coalesce(r_name, 'NONE') AS region_name
        |FROM customer
        |  LEFT JOIN dcc ON c_custkey = o_custkey AND o_orderstatus = 'O'
        |  LEFT JOIN duq ON c_nationkey = n_nationkey AND n_regionkey = c_nationkey % 5
        |WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "b3_dictionary_pkuq" ->
      """WITH sup AS (SELECT s_suppkey AS k FROM supplier),
        |tab_cols AS (SELECT 'GRAFT' AS owner, 'T' || (k % 10) AS table_name,
        |  'C' || k AS column_name, k AS column_id,
        |  CASE WHEN k % 13 = 0 THEN 'YES' ELSE 'NO' END AS hidden_column,
        |  CASE WHEN k % 17 = 0 THEN 'YES' ELSE 'NO' END AS virtual_column FROM sup),
        |constraints AS (SELECT 'GRAFT' AS owner,
        |  CASE WHEN k % 7 = 0 THEN 'PK_' || k ELSE 'CK_' || k END AS constraint_name,
        |  'T' || (k % 10) AS table_name,
        |  CASE WHEN k % 7 = 0 THEN 'P' ELSE 'C' END AS constraint_type
        |  FROM sup WHERE k % 7 = 0 OR k % 11 = 0),
        |cons_cols AS (SELECT 'GRAFT' AS owner,
        |  CASE WHEN k % 7 = 0 THEN 'PK_' || k ELSE 'CK_' || k END AS constraint_name,
        |  'T' || (k % 10) AS table_name, 'C' || k AS column_name
        |  FROM sup WHERE k % 7 = 0 OR k % 11 = 0),
        |ind_cols AS (
        |  SELECT 'GRAFT' AS table_owner, 'IX_' || k AS index_name,
        |    'T' || (k % 10) AS table_name, 'C' || k AS column_name FROM sup WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT 'GRAFT', 'IX2_' || k, 'T' || (k % 10), 'C' || k FROM sup WHERE k % 15 = 0),
        |indexes AS (
        |  SELECT 'GRAFT' AS owner, 'IX_' || k AS index_name,
        |    CASE WHEN k % 20 = 0 THEN 'NONUNIQUE' ELSE 'UNIQUE' END AS uniqueness
        |  FROM sup WHERE k % 5 = 0
        |  UNION ALL
        |  SELECT 'GRAFT', 'IX2_' || k, 'UNIQUE' FROM sup WHERE k % 15 = 0),
        |dcc AS (SELECT c.owner, c.table_name, cc.column_name, 1 AS pk
        |  FROM constraints c JOIN cons_cols cc
        |    ON c.owner = cc.owner AND c.constraint_name = cc.constraint_name
        |   AND c.table_name = cc.table_name
        |  WHERE c.constraint_type = 'P'),
        |duq AS (SELECT ic.table_owner AS owner, ic.table_name, ic.column_name, max(1) AS uq
        |  FROM ind_cols ic JOIN indexes i
        |    ON ic.table_owner = i.owner AND ic.index_name = i.index_name
        |  WHERE i.uniqueness = 'UNIQUE'
        |  GROUP BY 1, 2, 3)
        |SELECT t.owner, t.table_name, t.column_name, t.column_id,
        |  coalesce(pk, 0) AS pk_column, coalesce(uq, 0) AS uq_column
        |FROM tab_cols t
        |  LEFT OUTER JOIN dcc ON t.owner = dcc.owner AND t.table_name = dcc.table_name
        |    AND t.column_name = dcc.column_name
        |  LEFT OUTER JOIN duq ON t.owner = duq.owner AND t.table_name = duq.table_name
        |    AND t.column_name = duq.column_name
        |WHERE hidden_column = 'NO' AND virtual_column = 'NO'
        |ORDER BY t.table_name, t.column_id""".stripMargin,
    "b5_min_agg" ->
      """SELECT min(event_id) AS min_id, max(event_id) AS max_id,
        | cast(count(*) AS BIGINT) AS cnt FROM events""".stripMargin,
    "b6_union_distinct_min" ->
      """SELECT min(k) AS min_k, max(k) AS max_k, cast(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderkey BETWEEN 100 AND 5000
        |  UNION
        |  SELECT o_custkey AS k FROM orders WHERE o_totalprice BETWEEN 1000.0 AND 50000.0)""".stripMargin,
    "b7_listagg" ->
      """SELECT r_name, string_agg(n_name, ' ' ORDER BY n_name) AS nations,
        | cast(count(*) AS BIGINT) AS nation_cnt
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "b7_full_logfiles" ->
      """WITH archived AS (SELECT o_orderkey, o_custkey % 10 AS grp, 'ARCHIVED' AS kind
        |                  FROM orders WHERE o_orderstatus = 'F'),
        |online AS (SELECT o_orderkey, o_custkey % 10 AS grp,
        |                  CASE WHEN o_totalprice > 250000.0 THEN 'BIG' ELSE 'SMALL' END AS kind
        |           FROM orders WHERE o_orderstatus = 'O'),
        |registered AS (SELECT o_orderkey, o_custkey % 10 AS grp FROM orders WHERE o_orderkey % 3 = 0),
        |latest AS (SELECT o_orderkey, grp, kind FROM (
        |  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY o_orderkey DESC) AS rn
        |  FROM (SELECT * FROM archived UNION ALL SELECT * FROM online)) WHERE rn <= 5),
        |kept AS (SELECT o_orderkey, grp FROM latest EXCEPT SELECT o_orderkey, grp FROM registered)
        |SELECT l.grp AS grp,
        |  string_agg(cast(l.o_orderkey AS VARCHAR), ' ' ORDER BY l.o_orderkey) AS names,
        |  coalesce(max(CASE WHEN l.kind = 'BIG' THEN l.o_orderkey END), -1) AS max_big,
        |  cast(count(*) AS BIGINT) AS cnt
        |FROM kept k JOIN latest l ON k.o_orderkey = l.o_orderkey AND k.grp = l.grp
        |GROUP BY l.grp ORDER BY grp""".stripMargin,
    "b8_window_rownum" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "b9_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY custkey""".stripMargin,
    "events_distinct_users" ->
      """SELECT event_type, cast(count(DISTINCT user_id) AS BIGINT) AS uniq_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_window_agg" ->
      """SELECT epoch_ns(ts) // 60000000000 AS minute_bucket, event_type,
        | cast(count(*) AS BIGINT) AS event_cnt,
        | cast(sum(cast(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY minute_bucket, event_type LIMIT 500""".stripMargin,
    "b10_version_parse" ->
      """SELECT o_orderkey,
        | concat_ws('.', o_orderkey % 10, o_custkey % 100, 0) AS version,
        | cast(replace(concat_ws('.', o_orderkey % 10, o_custkey % 100, 0), '.', '') AS BIGINT) AS ver_num
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
  )
}
