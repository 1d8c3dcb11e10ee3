package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function surface (SURVEY.md §2 Tier B rows "Scalar: …",
  * "Nested", "JSON"): string/date/math/conditional/nested/JSON functions
  * the reference inherits from DataFusion, declared as Spark built-ins
  * (`org.apache.spark.sql.functions`) — all codegen'd, no UDFs.
  */
object ScalarQueries {
  import T._

  val all: Seq[Q] = Seq(
    Q("q_string",
      """SELECT c_custkey,
        | upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        | substr(c_name, 1, 10) AS pfx, length(c_name) AS nlen,
        | concat(c_name, '#', c_mktsegment) AS joined,
        | replace(c_name, 'Customer', 'C') AS shortname,
        | (c_name LIKE '%001%') AS has_001,
        | starts_with(c_mktsegment, 'B') AS seg_b
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 10).as("pfx"),
        length(col("c_name")).as("nlen"),
        concat(col("c_name"), lit("#"), col("c_mktsegment")).as("joined"),
        regexp_replace(col("c_name"), "Customer", "C").as("shortname"),
        col("c_name").like("%001%").as("has_001"),
        col("c_mktsegment").startsWith("B").as("seg_b"))
        .orderBy("c_custkey")
    },

    Q("q_date",
      """SELECT o_orderkey,
        | CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
        | CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mth,
        | CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      load(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).cast(DateType).as("plus30"),
        datediff(col("o_orderdate").cast(DateType),
          lit("1995-01-01").cast(DateType)).as("days_since"))
        .orderBy("o_orderkey")
    },

    Q("q_math",
      """SELECT c_custkey,
        | abs(c_acctbal) AS abal,
        | CAST(floor(c_acctbal) AS BIGINT) AS fl,
        | CAST(ceil(c_acctbal) AS BIGINT) AS cl,
        | sqrt(abs(c_acctbal)) AS rt,
        | c_custkey % 7 AS m7,
        | c_acctbal * 2 - 1 AS lin
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer").select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abal"),
        floor(col("c_acctbal")).as("fl"),
        ceil(col("c_acctbal")).as("cl"),
        sqrt(abs(col("c_acctbal"))).as("rt"),
        (col("c_custkey") % 7).as("m7"),
        (col("c_acctbal") * 2 - 1).as("lin"))
        .orderBy("c_custkey")
    },

    Q("q_case",
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 250000 THEN 'big'
        |      WHEN o_totalprice > 100000 THEN 'mid'
        |      ELSE 'small' END AS bucket,
        | coalesce(nullif(o_orderstatus, 'O'), 'open') AS status,
        | (o_totalprice IS NULL) AS price_null
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      load(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 250000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status"),
        col("o_totalprice").isNull.as("price_null"))
        .orderBy("o_orderkey")
    },

    // Struct build + nested field access (reference A20: named_struct /
    // col.field — engine/expressions/to_datafusion.rs:89-109); output is
    // re-flattened so the oracle compare stays on primitive columns.
    Q("q_struct",
      """SELECT c_custkey, c_name AS nm, c_acctbal AS bal
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      load(s, dir, "customer")
        .withColumn("st", struct(
          col("c_custkey").as("key"),
          col("c_name").as("nm"),
          struct(col("c_acctbal").as("bal")).as("inner")))
        .select(
          col("st.key").as("c_custkey"),
          col("st.nm").as("nm"),
          col("st.inner.bal").as("bal"))
        .orderBy("c_custkey")
    },

    Q("q_array_explode",
      """SELECT n_name, unnest([n_regionkey, n_regionkey + 10]) AS v
        |FROM nation ORDER BY n_name, v""".stripMargin) { (s, dir) =>
      load(s, dir, "nation")
        .select(col("n_name"),
          explode(array(col("n_regionkey"), col("n_regionkey") + 10)).as("v"))
        .orderBy("n_name", "v")
    },

    Q("q_array_funcs",
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS first_val,
        | list_contains(embedding, 0.0) AS has_zero
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      load(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
        array_contains(col("embedding"), 0.0f).as("has_zero"))
        .orderBy("vec_id")
    },

    Q("json_read",
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k1,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k2
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      ev.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k1"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k2"))
        .orderBy("event_id")
    },

    // events.ts is TIMESTAMP(NANOS): Spark reads it as raw long
    // (nanosAsLong), DuckDB via epoch_ns — both bucket identically.
    Q("q_events_window",
      """SELECT epoch_ns(ts) // 60000000000 AS minute_bucket,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY minute_bucket, event_type""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("minute_bucket", expr("ts div 60000000000"))
        .groupBy("minute_bucket", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("total_value"))
        .orderBy("minute_bucket", "event_type")
    })
}
