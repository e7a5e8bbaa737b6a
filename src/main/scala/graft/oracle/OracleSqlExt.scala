package graft.oracle

/** DuckDB oracle SQL for the extension operator families (graft.ext.*).
  *
  * Cross-engine determinism rules (see the ext Scaladoc): DECIMAL sums,
  * integer-quantized vector arithmetic, md5-based hashing, single IEEE
  * double divisions, explicit tie-breaks on every rank/limit.
  */
object OracleSqlExt {

  // ---------------------------------------------------------------- TPC-H

  val q1Pricing: String = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS sum_charge,
       count(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

  /** Mirror of Analytics.basketPairs (no Apriori prune — provably the
    * same output since pair support ≤ min(singleton supports)). The
    * basket-size cap (maxBasket = 1024) is mirrored faithfully even
    * though no TPC-H order comes near it — the two engines must agree
    * on the capped universe by construction, not by luck. */
  val ordersBasket: String = """
WITH sized AS (
  SELECT okey, part, COUNT(*) OVER (PARTITION BY okey) AS basket_n
  FROM (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
        FROM lineitem)),
dropped AS (
  SELECT COUNT(DISTINCT okey) AS orders_dropped
  FROM sized WHERE basket_n > 1024),
items AS (
  SELECT okey, part FROM sized WHERE basket_n <= 1024),
f AS (SELECT part, COUNT(*) AS n_part FROM items GROUP BY part),
tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
p AS (
  SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS support
  FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
  GROUP BY a.part, b.part),
j AS (
  SELECT p.part_a, p.part_b, p.support, fa.n_part AS n_a, fb.n_part AS n_b,
         CAST((p.support * t.n_orders * 1000) // (fa.n_part * fb.n_part)
              AS BIGINT) AS lift_milli
  FROM p
  JOIN f fa ON fa.part = p.part_a
  JOIN f fb ON fb.part = p.part_b
  CROSS JOIN tot t
  WHERE p.support >= 3)
SELECT part_a, part_b, support, n_a, n_b, lift_milli, rank, orders_dropped
FROM dropped LEFT JOIN (
  SELECT * FROM (
    SELECT j.*, row_number() OVER (ORDER BY support DESC, part_a, part_b)
      AS rank
    FROM j)
  WHERE rank <= 10) ON TRUE
WHERE part_a IS NOT NULL OR orders_dropped > 0"""

  /** Mirror of Analytics.promoRevenue (TPC-H Q14 shape): same decimal
    * lattice as q1Pricing, null-skipping promo CASE, one double
    * division for the share. */
  val q14Promo: String = """
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(4,2))) END) AS VARCHAR)
         AS promo_revenue,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS VARCHAR)
         AS total_revenue,
       100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS promo_pct,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'"""

  val q3Shipping: String = """
SELECT o_orderkey, CAST(revenue AS VARCHAR) AS revenue, order_date, order_priority
FROM (
  SELECT o.o_orderkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue,
         strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
         o.o_orderpriority AS order_priority
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
  ORDER BY revenue DESC, o.o_orderkey
  LIMIT 10)"""

  val q5RegionVolume: String = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name"""

  /** Mirror of Analytics.orderPriorityCheck (TPC-H Q4 shape on the
    * trimmed schema): EXISTS with a correlated non-equi lateness
    * predicate. Timestamp + INTERVAL arithmetic is exact in both
    * engines. */
  val q4Priority: String = """
SELECT o_orderpriority AS order_priority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority"""

  /** Mirror of Analytics.nationTrade (TPC-H Q7 shape): bilateral
    * revenue between a nation pair per ship year, both directions. */
  val q7NationTrade: String = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)"""

  /** Mirror of Analytics.marketShare (TPC-H Q8 shape): the share is
    * the same single double division of the two exact decimal sums
    * the Spark side performs. */
  val q8MarketShare: String = """
SELECT o_year,
       CAST(nation_rev AS VARCHAR) AS nation_revenue,
       CAST(total_rev AS VARCHAR) AS total_revenue,
       CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         SUM(CASE WHEN sn.n_name = 'NATION_3'
               THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  GROUP BY year(o.o_orderdate))"""

  /** Mirror of Analytics.productProfit (TPC-H Q9 shape on the trimmed
    * schema: p_retailprice stands in for ps_supplycost). */
  val q9Profit: String = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%bolt%'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name, year(o.o_orderdate)"""

  /** Mirror of Analytics.lateShipmentPriority (TPC-H Q12 shape):
    * conditional high/low counts of >90-day-late shipments per year. */
  val q12LatePriority: String = """
SELECT year(l.l_shipdate) AS ship_year,
       COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY year(l.l_shipdate)"""

  /** Mirror of Analytics.customerOrderDistribution (TPC-H Q13 shape):
    * LEFT join keeps zero-order customers; aggregate of aggregate. */
  val q13OrderDistribution: String = """
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey)
GROUP BY c_count"""

  /** Mirror of Analytics.topSupplier (TPC-H Q15 shape): the original's
    * scalar-subquery-over-a-view spelling; decimal equality is exact
    * so ties agree with the Spark broadcast-max form. */
  val q15TopSupplier: String = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue_d
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_revenue_d AS VARCHAR) AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_d = (SELECT MAX(total_revenue_d) FROM rev)"""

  /** Mirror of sql_q17_join_winmagic: a 0.2·avg(qty) correlated
    * threshold whose core is a JOIN (lineitem ⋈ Brand#23 part) — the
    * decorrelated-over-a-join WinMagic shape. The boundary cannot
    * diverge between Spark's decimal avg and DuckDB's double avg on
    * integer-valued quantities (see the query comment). */
  val q17JoinCore: String = """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
stats AS (
  SELECT l.l_partkey,
         AVG(CAST(l.l_quantity AS DECIMAL(18,2))) AS avg_qty
  FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
  GROUP BY l.l_partkey)
SELECT CAST(rev_d AS VARCHAR) AS below_avg_revenue,
       n_lines
FROM (
  SELECT SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev_d,
         COUNT(*)::BIGINT AS n_lines
  FROM lineitem l
  JOIN bp ON l.l_partkey = bp.p_partkey
  JOIN stats st ON l.l_partkey = st.l_partkey
  WHERE CAST(l.l_quantity AS DECIMAL(18,2)) < 0.2 * st.avg_qty)"""

  /** Mirror of sql_count_winmagic (the COUNT-bug WinMagic shape):
    * rows whose integer quantity strictly exceeds their part's line
    * count, grouped by return flag. DuckDB evaluates the correlated
    * count subquery directly; the comparison is integer vs integer so
    * the boundary is exact in both engines. */
  val countWinmagic: String = """
SELECT l_returnflag, count(*) AS n_deep,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
         AS revenue
FROM lineitem l
WHERE CAST(l_quantity AS BIGINT) >
      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY l_returnflag"""

  /** Mirror of Analytics.smallQuantityRevenue (TPC-H Q17 shape): the
    * same exact 5*qty*cnt < sum_qty boundary arithmetic. */
  val q17SmallQty: String = """
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
stats AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS sum_qty_d,
         COUNT(*) AS cnt_qty
  FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
  GROUP BY l.l_partkey)
SELECT CAST(rev_d AS VARCHAR) AS small_qty_revenue,
       CAST(rev_d AS DOUBLE) / 7.0 AS avg_yearly,
       n_lines
FROM (
  SELECT SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev_d,
         COUNT(*)::BIGINT AS n_lines
  FROM lineitem l
  JOIN bp ON l.l_partkey = bp.p_partkey
  JOIN stats st ON l.l_partkey = st.l_partkey
  WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * st.cnt_qty < st.sum_qty_d)"""

  /** Mirror of Analytics.waitingSuppliers (TPC-H Q21 shape, adapted):
    * sole-latest shipper of multi-supplier finished orders. */
  val q21WaitingSuppliers: String = """
WITH per AS (
  SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS supp_max_ship
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey),
fl AS (
  SELECT l_orderkey, l_suppkey, supp_max_ship,
         MAX(supp_max_ship) OVER w AS order_max_ship,
         COUNT(*) OVER w AS n_supps
  FROM per
  WINDOW w AS (PARTITION BY l_orderkey)),
fl2 AS (
  SELECT *,
         COUNT(CASE WHEN supp_max_ship = order_max_ship THEN 1 END)
           OVER (PARTITION BY l_orderkey) AS n_latest
  FROM fl)
SELECT s.s_name, COUNT(*)::BIGINT AS numwait
FROM fl2
JOIN supplier s ON s.s_suppkey = fl2.l_suppkey
WHERE n_supps > 1 AND n_latest = 1 AND supp_max_ship = order_max_ship
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20"""

  /** Mirror of Analytics.dormantValueCustomers (TPC-H Q22 shape): the
    * same exact bal*cnt > sum scalar comparison + NOT EXISTS anti. */
  val q22DormantValue: String = """
SELECT n.n_name AS nation, COUNT(*)::BIGINT AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS totacctbal
FROM customer c
CROSS JOIN (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal_d, COUNT(*) AS cnt_bal
  FROM customer WHERE c_acctbal > 0) st
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * st.cnt_bal > st.sum_bal_d
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY n.n_name"""

  /** Mirror of Analytics.supplierVariety (TPC-H Q16 shape): distinct
    * suppliers per (brand, type), size-banded, top-20 with group-key
    * tie-break. */
  val q16SupplierVariety: String = """
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size BETWEEN 1 AND 15
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
LIMIT 20"""

  /** Mirror of TextOps.datasetSplits: same md5-residue hash as
    * sampleHash, three half-open ranges at 80/90, per-(split, lang)
    * counts with residue-range audit columns. */
  val sampleSplits: String = """
SELECT split, lang, COUNT(*)::BIGINT AS n_docs,
       CAST(MIN(res) AS BIGINT) AS min_residue,
       CAST(MAX(res) AS BIGINT) AS max_residue
FROM (
  SELECT lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           AS res
  FROM documents) t
CROSS JOIN LATERAL (SELECT CASE WHEN res < 80 THEN 'train'
                                WHEN res < 90 THEN 'valid'
                                ELSE 'test' END AS split) s
GROUP BY split, lang"""

  /** Mirror of Analytics.multisetPartOps: EXCEPT ALL / INTERSECT ALL
    * bag semantics, surviving multiplicity per part. */
  val setopMultiset: String = """
SELECT l_partkey, CAST(multiplicity AS BIGINT) AS multiplicity, set_kind
FROM (
  SELECT l_partkey, COUNT(*) AS multiplicity,
         'returned_minus_accepted' AS set_kind
  FROM (
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
  GROUP BY l_partkey
  UNION ALL
  SELECT l_partkey, COUNT(*) AS multiplicity,
         'returned_and_accepted' AS set_kind
  FROM (
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
  GROUP BY l_partkey)"""

  /** Mirror of sql_q2_mincost (TPC-H Q2's correlated-scalar-subquery
    * shape on the trimmed schema): per-type min retail price lookup.
    * Raw double equality — both engines compare the same parquet
    * values, no arithmetic. */
  val q2MinCost: String = """
SELECT p.p_type, p.p_partkey, p.p_retailprice AS retail_price
FROM part p
WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
                         FROM part p2 WHERE p2.p_type = p.p_type)"""

  /** Mirror of Analytics.largeVolumeOrders (TPC-H Q18 shape): HAVING
    * subquery over exact decimal quantity sums, top-20 by
    * (o_totalprice DESC, o_orderkey). */
  val q18LargeOrders: String = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_totalprice AS total_price,
       CAST(b.qty_d AS VARCHAR) AS total_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300.00) b
  ON b.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20"""

  /** Mirror of Analytics.brandRevenue (TPC-H Q19 shape): three OR'd
    * (brand, quantity, size) branches over the part join, exact
    * decimal revenue. */
  val q19BrandRevenue: String = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS VARCHAR)
         AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
        AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
        AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#4' AND l.l_quantity BETWEEN 20 AND 30
        AND p.p_size BETWEEN 1 AND 15)"""

  /** Mirror of Analytics.returnedItemReport (TPC-H Q10 shape): returned
    * lineitems in one quarter, revenue per customer, top-20 with
    * (revenue DESC, c_custkey) tie-break. */
  val q10Returned: String = """
SELECT c_custkey, c_name, CAST(rev_d AS VARCHAR) AS revenue,
       acct_bal, nation
FROM (
  SELECT c.c_custkey, c.c_name, c.c_acctbal AS acct_bal, n.n_name AS nation,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev_d
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
  ORDER BY rev_d DESC, c.c_custkey
  LIMIT 20)"""

  /** Mirror of Analytics.orderMoments: INT64 power sums (exact cents
    * for sum/mean, floor-div whole dollars for the second moments —
    * `//` ≡ Spark `div` on non-negative cents), doubles only in the
    * final fixed-order expressions. int64→double is one correctly-
    * rounded IEEE conversion in both engines; the earlier
    * DECIMAL(38,4)→double mirror double-rounded through DuckDB's
    * scaled-int128 path and drifted a ulp at sf0.1. */
  val aggMoments: String = """
WITH q AS (
  SELECT o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 AS v,
         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders),
g AS (
  SELECT o_orderstatus,
         COUNT(*) AS n_orders,
         SUM(p) AS sx,
         CAST(SUM(cents) AS BIGINT) AS sc,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(v * v) AS BIGINT) AS sx2,
         CAST(SUM(d) AS BIGINT) AS sy,
         CAST(SUM(d * d) AS BIGINT) AS sy2,
         CAST(SUM(v * d) AS BIGINT) AS sxy
  FROM q GROUP BY o_orderstatus)
SELECT o_orderstatus, n_orders,
       CAST(sx AS VARCHAR) AS sum_price,
       CAST(sc AS DOUBLE) / 100 / n_orders AS mean_price,
       (CAST(sx2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n_orders) / n_orders AS var_price,
       (n_orders * CAST(sxy AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(n_orders * CAST(sx2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
            * sqrt(n_orders * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_price_day
FROM g"""

  /** Mirror of EventOps.valueAnomalies(z=3): quantized integer moments
    * per type, z-score with the identical floating-op order. */
  val eventsAnomalies: String = """
WITH qv AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 1000000) AS BIGINT) AS v
  FROM events),
st AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS sv, SUM(v * v) AS sv2
  FROM qv GROUP BY event_type),
m AS (
  SELECT event_type,
         CAST(sv AS DOUBLE) / n AS mean_q,
         sqrt((CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / n) AS std_q
  FROM st
  WHERE sqrt((CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) / n) > 0)
SELECT q.event_id, q.event_type, q.value,
       (CAST(q.v AS DOUBLE) - m.mean_q) / m.std_q AS zscore
FROM qv q JOIN m ON m.event_type = q.event_type
WHERE abs((CAST(q.v AS DOUBLE) - m.mean_q) / m.std_q) > 3"""

  val windowTopOrders: String = """
SELECT o_custkey, o_orderkey,
       o_totalprice AS total_price, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders)
WHERE rank <= 3"""

  val windowRunningSpend: String = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice AS total_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS running_spend
FROM orders"""

  val windowRangeFrame: String = """
SELECT o_custkey, o_orderkey,
       datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
       count(*) OVER w AS n_orders_16d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS VARCHAR) AS spend_16d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 15 PRECEDING AND CURRENT ROW)"""

  val windowOrderGaps: String = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       datediff('day', CAST(lag(o_orderdate, 1) OVER w AS DATE),
                CAST(o_orderdate AS DATE)) AS days_since_prev,
       lead(o_orderkey, 1) OVER w AS next_orderkey,
       ntile(4) OVER w AS date_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""

  val pivotStatus: String = """
SELECT o_orderpriority AS order_priority,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders GROUP BY o_orderpriority"""

  val rollupRevenue: String = """
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)"""

  val cubeStatusPriority: String = """
SELECT o_orderstatus AS order_status, o_orderpriority AS order_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)"""

  /** Mirror of Analytics.statusPrioritySets: the pruned subtotal
    * lattice — (status, priority), (status), () — via GROUPING SETS. */
  val aggGroupingSets: String = """
SELECT o_orderstatus AS order_status, o_orderpriority AS order_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())"""

  /** Mirror of Analytics.approxDistinctCustomers' GATED projection:
    * the HLL sketch value is engine-specific and excluded, but the
    * exact count, the integer 3σ bound (ceil-div, positive operands,
    * so `//` ≡ Spark `div`), and the accuracy claim `within_bound`
    * (predicted TRUE — Spark computes it for real from its sketch)
    * hash-gate cross-engine. */
  val aggApproxDistinct: String = """
SELECT o_orderpriority AS order_priority,
       COUNT(DISTINCT o_custkey)::BIGINT AS exact_customers,
       (15 * COUNT(DISTINCT o_custkey)::BIGINT + 99) // 100 AS bound,
       TRUE AS within_bound
FROM orders GROUP BY o_orderpriority"""

  /** Mirror of Analytics.statusPercentilesApprox' GATED projection:
    * the t-digest/GK values are engine-specific and excluded; the
    * exact group counts and the rank-error-bracket booleans (predicted
    * TRUE — Spark checks its approx values against the exact DECIMAL
    * bracket for real) hash-gate. */
  val aggPercentilesApprox: String = """
SELECT o_orderstatus AS order_status,
       COUNT(*)::BIGINT AS n_orders,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders GROUP BY o_orderstatus"""

  /** Mirror of Analytics.statusPercentiles: percentile_disc by rank
    * arithmetic — value at row ⌈p·n⌉ of the per-group sort. */
  val aggPercentiles: String = """
WITH ranked AS (
  SELECT o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders)
SELECT o_orderstatus AS order_status,
       max(n) AS n_orders,
       CAST(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN price END) AS VARCHAR) AS p50_price,
       CAST(max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN price END) AS VARCHAR) AS p90_price,
       CAST(max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN price END) AS VARCHAR) AS p99_price
FROM ranked GROUP BY o_orderstatus"""

  val setopSegments: String = """
SELECT c_custkey, 'building_no_open' AS set_kind FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, 'highbal_open' AS set_kind FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')"""

  // --------------------------------------------------------------- events

  val eventsTumbling: String = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sum_value
FROM events
GROUP BY 1, 2"""

  val eventsSliding: String = """
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - i * INTERVAL '30 minutes',
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events
FROM events, (VALUES (0), (1)) t(i)
GROUP BY 1, 2"""

  val eventsSession: String = """
WITH marks AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
grp AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marks)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sum_value
FROM grp GROUP BY user_id, sid"""

  val eventsAsof: String = """
WITH tagged AS (
  SELECT user_id, ts, event_id, 0 AS side, ts AS c_ts, event_id AS c_eid
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side, NULL, NULL
  FROM events WHERE event_type = 'purchase'),
filled AS (
  SELECT user_id, ts, event_id, side,
         last_value(c_ts IGNORE NULLS) OVER w AS click_ts_t,
         last_value(c_eid IGNORE NULLS) OVER w AS click_event_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, event_id AS purchase_event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       click_event_id,
       strftime(click_ts_t, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       epoch_us(ts) - epoch_us(click_ts_t) AS gap_us
FROM filled WHERE side = 1"""

  /** Mirror of TemporalJoins.clickAsOfPurchaseNative(tolerance=10min):
    * the plain as-of, then matches older than the bound nulled —
    * click columns AND gap together, the all-or-nothing emit the
    * merge's tolerance check performs. */
  val eventsAsofTolerance: String = s"""
WITH base AS ($eventsAsof)
SELECT user_id, purchase_event_id, purchase_ts,
       CASE WHEN gap_us <= 600000000 THEN click_event_id END
         AS click_event_id,
       CASE WHEN gap_us <= 600000000 THEN click_ts END AS click_ts,
       CASE WHEN gap_us <= 600000000 THEN gap_us END AS gap_us
FROM base"""

  /** Window-form twin of the FORWARD-direction native as-of: for each
    * purchase, the earliest click at-or-after it (lowest event_id
    * among equal-ts clicks — the mirror of backward's highest). Same
    * union trick scanned in REVERSE (ts DESC): every row before a
    * purchase in scan order is at-or-after it; side ASC keeps an
    * equal-ts click visible, event_id DESC makes the last-seen click
    * among equal ts the lowest id. gap_us stays purchase − click, so
    * forward matches are negative — the direction audit column. */
  val eventsAsofFwd: String = """
WITH tagged AS (
  SELECT user_id, ts, event_id, 0 AS side, ts AS c_ts, event_id AS c_eid
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side, NULL, NULL
  FROM events WHERE event_type = 'purchase'),
filled AS (
  SELECT user_id, ts, event_id, side,
         last_value(c_ts IGNORE NULLS) OVER w AS click_ts_t,
         last_value(c_eid IGNORE NULLS) OVER w AS click_event_id
  FROM tagged
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts DESC NULLS LAST, side ASC, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, event_id AS purchase_event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       click_event_id,
       strftime(click_ts_t, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       epoch_us(ts) - epoch_us(click_ts_t) AS gap_us
FROM filled WHERE side = 1"""

  /** Window-form twin of the NEAREST-direction native as-of: both the
    * backward window (latest click at-or-before, highest event_id on
    * ties) and the forward window (earliest at-or-after, lowest id)
    * computed in one pass, then the closer candidate chosen with
    * distance ties to the backward one — pandas' prior-row rule. An
    * equal-ts click lands in BOTH windows at distance 0 and the tie
    * rule hands it to backward, which is exactly the merge exec's
    * consume-equal-ts-into-the-carry behavior. */
  val eventsAsofNearest: String = """
WITH tagged AS (
  SELECT user_id, ts, event_id, 0 AS side, ts AS c_ts, event_id AS c_eid
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side, NULL, NULL
  FROM events WHERE event_type = 'purchase'),
filled AS (
  SELECT user_id, ts, event_id, side,
         last_value(c_ts IGNORE NULLS) OVER wb AS b_ts,
         last_value(c_eid IGNORE NULLS) OVER wb AS b_eid,
         last_value(c_ts IGNORE NULLS) OVER wf AS f_ts,
         last_value(c_eid IGNORE NULLS) OVER wf AS f_eid
  FROM tagged
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, side, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id
                ORDER BY ts DESC NULLS LAST, side ASC, event_id DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
chosen AS (
  SELECT user_id, ts, event_id,
         CASE WHEN b_eid IS NOT NULL AND (f_eid IS NULL
                   OR epoch_us(ts) - epoch_us(b_ts)
                      <= epoch_us(f_ts) - epoch_us(ts))
              THEN b_ts ELSE f_ts END AS click_ts_t,
         CASE WHEN b_eid IS NOT NULL AND (f_eid IS NULL
                   OR epoch_us(ts) - epoch_us(b_ts)
                      <= epoch_us(f_ts) - epoch_us(ts))
              THEN b_eid ELSE f_eid END AS click_event_id
  FROM filled WHERE side = 1)
SELECT user_id, event_id AS purchase_event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       click_event_id,
       strftime(click_ts_t, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       epoch_us(ts) - epoch_us(click_ts_t) AS gap_us
FROM chosen"""

  val eventsRange: String = """
SELECT p.user_id, p.event_id AS purchase_event_id, c.event_id AS click_event_id,
       epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
FROM events p
JOIN events c ON c.user_id = p.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 60 MINUTE"""

  /** Oracle for the salted two-phase aggregation: the PLAIN single-phase
    * form — the salt is a physical detail, the result must be identical. */
  val eventsSaltedCounts: String = """
SELECT event_type, count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sum_value
FROM events GROUP BY event_type"""

  val eventsFirst: String = """
SELECT user_id, event_type,
       min(event_id) AS first_event_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       count(*) AS n_total
FROM events GROUP BY user_id, event_type"""

  val eventsPropsJson: String = """
SELECT event_type, count(*) AS n_events,
       min(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type"""

  val textHashSample: String = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10"""

  /** Mirror of TextOps.stratifiedSample's per-language rate cascade. */
  val sampleStratified: String = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
      CASE WHEN lang = 'en' THEN 10 WHEN lang = 'de' THEN 50
           WHEN lang = 'fr' THEN 100 WHEN lang = 'es' THEN 25 ELSE 0 END"""

  /** Mirror of TextOps.tokenShards (budget 2048, per-lang packing). */
  val corpusShards: String = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, lang, n_tokens,
       CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 2048
         AS BIGINT) AS shard_id
FROM t"""

  /** Mirror of TextOps.packSequences (seqLen 2048): per-lang token
    * cumsum, then each doc's covered sequence range unnested with the
    * per-sequence span arithmetic. */
  val textPackSequences: String = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens
  FROM documents),
o AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS BIGINT) AS tok_offset
  FROM t WHERE n_tokens > 0)
SELECT doc_id, lang, CAST(s AS BIGINT) AS seq_id,
       CAST(greatest(0, s * 2048 - tok_offset) AS BIGINT) AS tok_start,
       CAST(least(n_tokens, (s + 1) * 2048 - tok_offset) AS BIGINT) AS tok_end
FROM o, UNNEST(range(tok_offset // 2048, (tok_offset + n_tokens - 1) // 2048 + 1)) u(s)"""

  /** Mirror of TextOps.globalTokenShards (budget 2048): the oracle is
    * the SINGLE-window global cumsum the two-phase prefix sum must
    * equal — partition-boundary invariance is the property under
    * test. */
  val corpusShardsGlobal: String = """
WITH t AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(string_split(text, ' '),
                                      w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
         AS BIGINT) AS tok_offset,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 2048
         AS BIGINT) AS shard_id
FROM t"""

  /** Mirror of TextOps.bigrams (k=10): adjacent-pair explode, count,
    * per-lang top-k with ties on the bigram string. */
  val textBigrams: String = """
WITH t AS (SELECT lang, string_split(text, ' ') AS tk FROM documents),
bg AS (
  SELECT lang, tk[i] || ' ' || tk[i + 1] AS bigram
  FROM t, UNNEST(range(1, len(tk))) u(i)),
cnt AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram)
SELECT lang, bigram, n, rank FROM (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
  FROM cnt)
WHERE rank <= 10"""

  /** Mirror of TextOps.unigramSurprisal: corpus unigram counts → per-
    * token integer bits (length(bin(N)) − length(bin(c)) — the highest-
    * set-bit position, no float log) → exact per-doc sums. */
  val textSurprisal: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
tot AS (SELECT COUNT(*) AS n_total FROM tok),
b AS (
  SELECT t.doc_id, CAST(length(bin(x.n_total)) - length(bin(c.c)) AS BIGINT) AS bits
  FROM tok t JOIN cnt c USING (tok) CROSS JOIN tot x)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS bits_per_token
FROM b GROUP BY doc_id"""

  /** Mirror of TextOps.bigramSurprisal: per-doc bigram tf, pair and
    * context count frames derived from it, integer-bit conditional
    * surprisal summed per doc. Same length(bin(..)) ⌊log₂⌋ idiom as
    * textSurprisal; docs with < 2 tokens emit no row in both engines. */
  val textPerplexity: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
bg AS (
  SELECT doc_id, t[u.i] AS t1, t[u.i + 1] AS t2
  FROM toks, UNNEST(range(1, n)) u(i)
  WHERE n >= 2),
dtf AS (
  SELECT doc_id, t1, t2, COUNT(*) AS tf FROM bg GROUP BY doc_id, t1, t2),
c12 AS (
  SELECT t1, t2, CAST(SUM(tf) AS BIGINT) AS c12 FROM dtf GROUP BY t1, t2),
c1 AS (SELECT t1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY t1)
SELECT d.doc_id, CAST(SUM(d.tf) AS BIGINT) AS n_bigrams,
       CAST(SUM(d.tf * (length(bin(c1.c1)) - length(bin(c12.c12))))
            AS BIGINT) AS total_bits,
       CAST(SUM(d.tf * (length(bin(c1.c1)) - length(bin(c12.c12))))
            AS DOUBLE) / SUM(d.tf) AS bits_per_bigram
FROM dtf d JOIN c12 USING (t1, t2) JOIN c1 USING (t1)
GROUP BY d.doc_id"""

  /** Mirror of TextOps.chunkDocuments (w=64, stride=48): per-doc
    * overlapping token windows via a lateral range over the chunk
    * index; span math all-integer, chunk text from an array slice. */
  val textChunk: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
c AS (
  SELECT doc_id, t, n, CAST(u.k AS INT) AS chunk_idx,
         CAST(u.k * 48 + 1 AS INT) AS start_tok
  FROM toks, UNNEST(range(0, (greatest(n - 64, 0) + 47) // 48 + 1)) u(k))
SELECT doc_id, chunk_idx, start_tok,
       CAST(least(start_tok + 63, n) AS INT) AS end_tok,
       CAST(least(start_tok + 63, n) - start_tok + 1 AS INT)
         AS n_chunk_tokens,
       array_to_string(t[start_tok:least(start_tok + 63, n)], ' ')
         AS chunk_text,
       md5(array_to_string(t[start_tok:least(start_tok + 63, n)], ' '))
         AS chunk_md5
FROM c"""

  /** Mirror of EventOps.topPaths: per-user lead() windows in
    * (ts, event_id) order, corpus-wide path counts, deterministic
    * top-10. */
  val eventsPaths: String = """
WITH s AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS e3
  FROM events),
c AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY 1)
SELECT path, n, rank FROM (
  SELECT c.*, row_number() OVER (ORDER BY n DESC, path) AS rank FROM c)
WHERE rank <= 10"""

  /** Mirror of Corpus.upsertMerge: the same deterministic update/insert
    * slices, one window per merge key, max-version survivor + op
    * label. */
  val corpusUpsert: String = """
WITH m AS (
  SELECT doc_id, text, 1 AS version FROM documents
  UNION ALL
  SELECT doc_id, reverse(text), 2 FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 10000000, text, 2 FROM documents WHERE doc_id % 5 = 0),
r AS (
  SELECT doc_id, text, version,
         row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_versions
  FROM m)
SELECT doc_id, CAST(version AS BIGINT) AS version,
       CASE WHEN n_versions = 2 THEN 'update'
            WHEN version = 2 THEN 'insert' ELSE 'keep' END AS op,
       md5(text) AS content_md5
FROM r WHERE rn = 1"""

  /** Mirror of TextOps.vocabEncodeFrom: df-ranked top-100 vocabulary,
    * positional encode with OOV→0, and the md5 of the position-ordered
    * id sequence. */
  val textVocabEncode: String = """
WITH tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok),
v AS (
  SELECT term, token_id FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term) AS token_id
    FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term))
  WHERE token_id <= 100),
pos AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       UNNEST(range(1, len(t) + 1)) u(i)),
enc AS (
  SELECT p.doc_id, p.pos, COALESCE(v.token_id, 0) AS id
  FROM pos p LEFT JOIN v ON v.term = p.term)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS oov_rate,
       md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
FROM enc GROUP BY doc_id"""

  /** Mirror of TextOps.collocations: adjacent-pair and unigram counts
    * per language, integer milli-lift (c_xy·N·1000)//(c_x·c_y) — both
    * engines' integer division agrees on the non-negative operands —
    * and the same (lift, n_pair, t1, t2) deterministic top-10. */
  val textPmi: String = """
WITH t AS (SELECT lang, string_split(text, ' ') AS tk FROM documents),
pg AS (
  SELECT lang, tk[i] AS t1, tk[i + 1] AS t2
  FROM t, UNNEST(range(1, len(tk))) u(i)),
pc AS (SELECT lang, t1, t2, COUNT(*) AS n_pair FROM pg GROUP BY lang, t1, t2),
uni AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
uc AS (SELECT lang, tok, COUNT(*) AS n_tok FROM uni GROUP BY lang, tok),
tot AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS n_lang FROM uc GROUP BY lang),
j AS (
  SELECT p.lang, p.t1, p.t2, p.n_pair, a.n_tok AS n_t1, b.n_tok AS n_t2,
         CAST((p.n_pair * x.n_lang * 1000) // (a.n_tok * b.n_tok) AS BIGINT)
           AS lift_milli
  FROM pc p
  JOIN uc a ON a.lang = p.lang AND a.tok = p.t1
  JOIN uc b ON b.lang = p.lang AND b.tok = p.t2
  JOIN tot x ON x.lang = p.lang
  WHERE p.n_pair >= 3)
SELECT lang, t1, t2, n_pair, n_t1, n_t2, lift_milli, rank FROM (
  SELECT j.*, row_number() OVER (PARTITION BY lang
    ORDER BY lift_milli DESC, n_pair DESC, t1, t2) AS rank
  FROM j)
WHERE rank <= 10"""

  /** Mirror of TextOps.unigramEntropy: per-(lang, tok) counts, integer-
    * bit entropy numerator (same highest-set-bit log as textSurprisal),
    * two final divisions only. */
  val textEntropy: String = """
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT lang, tok, COUNT(*) AS c FROM tok GROUP BY lang, tok),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS vocab
        FROM cnt GROUP BY lang),
b AS (
  SELECT c.lang, t.n_tokens, t.vocab,
         c.c * CAST(length(bin(t.n_tokens)) - length(bin(c.c)) AS BIGINT) AS bits
  FROM cnt c JOIN tot t USING (lang))
SELECT lang, n_tokens, vocab,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST(SUM(bits) AS DOUBLE) / n_tokens AS bits_per_token,
       CAST(vocab AS DOUBLE) / n_tokens AS type_token_ratio
FROM b GROUP BY lang, n_tokens, vocab"""

  /** Mirror of TextOps.qualityGate: the shared quality formula,
    * percentile_disc-by-rank-arithmetic over per-(lang, score) counts,
    * keep = score ≥ threshold. */
  // def, not val: references `occ`, declared further down the object —
  // a val here would read null during object init
  def corpusQualityGate: String = s"""
WITH q AS (
  SELECT doc_id, lang,
         least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100) * 0.4
         + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) * 0.4
         + least(1.0, CAST(${occ("the ", 4)} + ${occ("a ", 2)} AS DOUBLE) / 5) * 0.2
           AS quality_score
  FROM documents),
sc AS (SELECT lang, quality_score, COUNT(*) AS c FROM q GROUP BY lang, quality_score),
cum AS (
  SELECT lang, quality_score, c,
         SUM(c) OVER (PARTITION BY lang ORDER BY quality_score DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS n_lang
  FROM sc),
thr AS (
  SELECT lang, MAX(quality_score) AS threshold,
         CAST(MAX(n_lang) AS BIGINT) AS n_lang
  FROM cum WHERE cum >= (n_lang * 75 + 99) // 100
  GROUP BY lang)
SELECT q.doc_id, q.lang, q.quality_score, t.threshold, t.n_lang,
       q.quality_score >= t.threshold AS keep
FROM q JOIN thr t USING (lang)"""

  /** Mirror of TextOps.piiScrub. The patterns avoid every Java-vs-RE2
    * divergence (no backrefs/lookaround); DuckDB regexp_replace needs
    * the explicit 'g' flag to match Spark's replace-all. */
  val textPiiScrub: String = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phone = "\\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    s"""
SELECT doc_id, lang,
       len(regexp_extract_all(text, '$email')) AS n_emails,
       len(regexp_extract_all(text, '$phone')) AS n_phones,
       len(regexp_extract_all(text, '$ip')) AS n_ips,
       len(regexp_extract_all(text, '$email'))
         + len(regexp_extract_all(text, '$phone'))
         + len(regexp_extract_all(text, '$ip')) > 0 AS has_pii,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(text, '$email', '<EMAIL>', 'g'),
               '$phone', '<PHONE>', 'g'),
             '$ip', '<IP>', 'g')) AS scrubbed_md5
FROM documents"""
  }

  /** Mirror of TextOps.benchmarkContamination: corpus docs sharing an
    * 8-token shingle with the doc_id%97=0 benchmark set. */
  val corpusContamination: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+5], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(n - 5, 1) + 1)) u(i)),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 11 = 0 AND doc_id < 5000)
SELECT doc_id, count(*) AS n_benchmark_shingles
FROM sh JOIN bench USING (s)
WHERE (doc_id % 11 <> 0 OR doc_id >= 5000)
GROUP BY doc_id"""

  /** Mirror of TextOps.decontaminateSpans: positioned 6-gram hits vs
    * the benchmark set, fixed-length-interval island merge via the
    * lag-gap flag cumsum, integer span arithmetic and milli ratio. */
  val corpusDecontamSpans: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
shp AS (
  SELECT doc_id, n AS n_tokens, i AS pos, array_to_string(t[i:i+5], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(n - 5, 1) + 1)) u(i)),
bench AS (SELECT DISTINCT s FROM shp WHERE doc_id % 11 = 0 AND doc_id < 5000),
hits AS (
  SELECT DISTINCT doc_id, n_tokens, pos
  FROM shp JOIN bench USING (s) WHERE (doc_id % 11 <> 0 OR doc_id >= 5000)),
brk AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN lag(pos) OVER w IS NULL
               OR pos - lag(pos) OVER w > 5 THEN 1 ELSE 0 END AS brk
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl AS (
  SELECT doc_id, n_tokens, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM brk),
sp AS (
  SELECT doc_id, n_tokens, island, MIN(pos) AS s0,
         least(MAX(pos) + 5, n_tokens) AS e0, COUNT(*) AS n_hits
  FROM isl GROUP BY doc_id, n_tokens, island)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       CAST(SUM(n_hits) AS BIGINT) AS n_matches,
       COUNT(*)::BIGINT AS n_spans,
       CAST(SUM(e0 - s0 + 1) AS BIGINT) AS n_tokens_contaminated,
       CAST((1000 * (n_tokens - SUM(e0 - s0 + 1))) // n_tokens AS BIGINT)
         AS clean_milli
FROM sp GROUP BY doc_id, n_tokens"""

  /** Mirror of TextOps.decontaminateExcise: same span CTEs as
    * corpusDecontamSpans, then the apply side — contaminated docs are
    * re-tokenized with positions, covered positions dropped, the rest
    * re-joined in pos order; untouched docs pass through
    * byte-identical (never reconstructed, so odd spacing survives
    * exactly as in the Spark identity branch). A fully-covered doc
    * yields the empty string via the COALESCE, matching Spark's
    * concat_ws over an empty filtered array. */
  val corpusDecontamExcise: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
shp AS (
  SELECT doc_id, n AS n_tokens, i AS pos, array_to_string(t[i:i+5], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(n - 5, 1) + 1)) u(i)),
bench AS (SELECT DISTINCT s FROM shp WHERE doc_id % 11 = 0 AND doc_id < 5000),
hits AS (
  SELECT DISTINCT doc_id, n_tokens, pos
  FROM shp JOIN bench USING (s) WHERE (doc_id % 11 <> 0 OR doc_id >= 5000)),
brk AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN lag(pos) OVER w IS NULL
               OR pos - lag(pos) OVER w > 5 THEN 1 ELSE 0 END AS brk
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl AS (
  SELECT doc_id, n_tokens, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM brk),
sp AS (
  SELECT doc_id, n_tokens, island, MIN(pos) AS s0,
         least(MAX(pos) + 5, n_tokens) AS e0
  FROM isl GROUP BY doc_id, n_tokens, island),
nsp AS (SELECT doc_id, COUNT(*) AS n_spans_cut FROM sp GROUP BY doc_id),
ptok AS (
  SELECT tk.doc_id, u.i AS pos, tk.t[u.i] AS tok
  FROM toks tk JOIN nsp ON nsp.doc_id = tk.doc_id,
       UNNEST(range(1, tk.n + 1)) u(i)),
kept AS (
  SELECT p.doc_id, p.pos, p.tok
  FROM ptok p
  WHERE NOT EXISTS (SELECT 1 FROM sp
                    WHERE sp.doc_id = p.doc_id
                      AND p.pos BETWEEN sp.s0 AND sp.e0)),
cl AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN nsp.doc_id IS NULL THEN d.text
            ELSE COALESCE(cl.clean_text, '') END AS clean_text,
       CAST(COALESCE(nsp.n_spans_cut, 0) AS INT) AS n_spans_cut,
       md5(CASE WHEN nsp.doc_id IS NULL THEN d.text
                ELSE COALESCE(cl.clean_text, '') END) AS clean_md5
FROM documents d
LEFT JOIN nsp ON nsp.doc_id = d.doc_id
LEFT JOIN cl ON cl.doc_id = d.doc_id
WHERE (d.doc_id % 11 <> 0 OR d.doc_id >= 5000)"""

  val textNormalize: String = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents)
SELECT doc_id, norm_text, md5(norm_text) AS norm_md5,
       length(norm_text) AS n_chars_norm
FROM n"""

  val textTopTerms: String = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rank
  FROM tf JOIN df USING (term))
SELECT doc_id, rank, term, tf, df FROM ranked WHERE rank <= 3"""

  // ----------------------------------------------------------------- text

  private val occ =
    (needle: String, len: Int) =>
      s"CAST((length(text) - length(replace(text, '$needle', ''))) / $len AS INT)"

  val textStats: String = s"""
SELECT doc_id, lang,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       ${occ("the ", 4)} + ${occ("a ", 2)} AS n_stopwords,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
       CAST(${occ("the ", 4)} + ${occ("a ", 2)} AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS distinct_ratio,
       least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100) AS length_score
FROM documents"""

  val textQuality: String = s"""
SELECT doc_id,
       least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100) * 0.4
       + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) * 0.4
       + least(1.0, CAST(${occ("the ", 4)} + ${occ("a ", 2)} AS DOUBLE) / 5) * 0.2
         AS quality_score
FROM documents"""

  /** Mirror of Corpus.epochOrder(epochs=2, shards=8): epoch-salted
    * md5 shard assignment + intra-shard (hash, doc_id) rank per
    * epoch. */
  /** r19 tombstone-excision serving path: the engine ingests documents
    * through the exact-dedup layer (keep = first doc_id per content
    * digest), tombstones every doc with n_chars % 7 = 3, and serves
    * the active view (data anti-join tombs). The oracle recomputes
    * both rules straight off the documents table. */
  val corpusTombstoneActive: String = """
WITH canon AS (
  SELECT doc_id, md5(text) AS content_md5,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, content_md5
FROM canon
WHERE rn = 1
  AND doc_id NOT IN (SELECT doc_id FROM documents WHERE n_chars % 7 = 3)"""

  val corpusEpochOrder: String = """
SELECT doc_id,
       h0 % 8 AS shard_e0,
       (ROW_NUMBER() OVER (PARTITION BY h0 % 8 ORDER BY h0, doc_id))::BIGINT
         AS pos_e0,
       h1 % 8 AS shard_e1,
       (ROW_NUMBER() OVER (PARTITION BY h1 % 8 ORDER BY h1, doc_id))::BIGINT
         AS pos_e1
FROM (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || ':0'), 1, 8))::BIGINT AS h0,
         ('0x' || substr(md5(doc_id::VARCHAR || ':1'), 1, 8))::BIGINT AS h1
  FROM documents) t"""

  /** Mirror of TextOps.dsirResample: same md5 unigram buckets, add-1
    * smoothed target/raw counts over the fixed 1024-bucket universe,
    * integer-bit log ratio per bucket, per-raw-doc token-multiplicity
    * bit sums, deterministic top-200 by (weight DESC, doc_id). */
  val sampleDsir: String = """
WITH tb AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS bucket
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents)),
stats AS (
  SELECT bucket,
         SUM(CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN source IN ('src0','src1') THEN 0 ELSE 1 END) AS cr
  FROM tb GROUP BY bucket),
tot AS (SELECT SUM(ct) + 1024 AS nt, SUM(cr) + 1024 AS nr FROM stats),
bits AS (
  SELECT bucket,
         CAST((length(bin(ct + 1)) - length(bin(cr + 1)))
            - (length(bin(nt)) - length(bin(nr))) AS BIGINT) AS bits
  FROM stats CROSS JOIN tot)
SELECT doc_id, source, COUNT(*)::BIGINT AS n_tokens,
       SUM(bits)::BIGINT AS weight_bits
FROM tb JOIN bits USING (bucket)
WHERE source NOT IN ('src0','src1')
GROUP BY doc_id, source
ORDER BY weight_bits DESC, doc_id
LIMIT 200"""

  /** Mirror of TextOps.gopherGate: same integer milli-ratios (floor
    * division on non-negative operands), same space-padded word-
    * boundary stopword probes, same rule thresholds and AND'd keep. */
  val textGopherGate: String = """
SELECT doc_id, lang, wc,
       mwl_milli::BIGINT AS mwl_milli, sym_milli::BIGINT AS sym_milli,
       alpha_milli::BIGINT AS alpha_milli, stop_distinct,
       wc >= 20 AND wc <= 100000 AS r_wc,
       mwl_milli >= 3000 AND mwl_milli <= 10000 AS r_mwl,
       sym_milli <= 100 AS r_sym,
       alpha_milli >= 800 AS r_alpha,
       stop_distinct >= 2 AS r_stop,
       (wc >= 20 AND wc <= 100000) AND mwl_milli >= 3000
         AND mwl_milli <= 10000 AND sym_milli <= 100
         AND alpha_milli >= 800 AND stop_distinct >= 2 AS keep
FROM (
  SELECT doc_id, lang, wc,
         ((length(text) - (wc - 1)) * 1000) // wc AS mwl_milli,
         (sym * 1000) // wc AS sym_milli,
         (alpha_words * 1000) // wc AS alpha_milli,
         stop_distinct
  FROM (
    SELECT doc_id, lang, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
           CAST((length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '...', ''))) // 3
             AS BIGINT) AS sym,
           CAST(len(list_filter(string_split(text, ' '),
             x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
           CAST((CASE WHEN position(' the ' IN ' ' || text || ' ') > 0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN position(' and ' IN ' ' || text || ' ') > 0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN position(' a ' IN ' ' || text || ' ') > 0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN position(' of ' IN ' ' || text || ' ') > 0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN position(' to ' IN ' ' || text || ' ') > 0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN position(' in ' IN ' ' || text || ' ') > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS stop_distinct
    FROM documents) a) b"""

  /** Mirror of TextOps.sourceCaps(cap=16): the textQuality expression
    * verbatim, ranked per source (DESC NULLS LAST + doc_id tie-break,
    * Spark's desc_nulls_last spelled out), kept through rank ≤ 16. */
  val corpusSourceCaps: String = s"""
WITH q AS (
  SELECT doc_id, source,
         least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100) * 0.4
         + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) * 0.4
         + least(1.0, CAST(${occ("the ", 4)} + ${occ("a ", 2)} AS DOUBLE) / 5) * 0.2
           AS quality_score
  FROM documents)
SELECT doc_id, source, quality_score, src_rank FROM (
  SELECT doc_id, source, quality_score,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality_score DESC NULLS LAST, doc_id)
           AS src_rank
  FROM q)
WHERE src_rank <= 16"""

  val textLangId: String = s"""
WITH s AS (
  SELECT doc_id, lang,
         ${occ("the ", 4)} + ${occ("a ", 2)} + ${occ("and ", 4)} AS score_en,
         ${occ("der ", 4)} + ${occ("und ", 4)} + ${occ("die ", 4)} AS score_de,
         ${occ("le ", 3)} + ${occ("la ", 3)} + ${occ("et ", 3)} AS score_fr,
         ${occ("el ", 3)} + ${occ("los ", 4)} + ${occ("y ", 2)} AS score_es
  FROM documents)
SELECT doc_id, lang AS labeled_lang, score_en, score_de, score_fr, score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
            WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
            WHEN score_fr >= score_es THEN 'fr'
            ELSE 'es' END AS predicted_lang
FROM s"""

  val textTokens: String = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       CAST(list_sum(list_transform(string_split(text, ' '),
                                    w -> (length(w) + 3) // 4)) AS INT) AS bpe_tokens,
       CAST(length(text) AS DOUBLE)
         / list_sum(list_transform(string_split(text, ' '),
                                   w -> (length(w) + 3) // 4)) AS chars_per_bpe_token
FROM documents"""

  /** Mirror of TextOps.repetition: per-(doc, 3-gram) counts, then
    * per-doc totals; 1-based truncating slice matches Spark's. */
  val textRepetition: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(n - 2, 1) + 1)) u(i)),
gc AS (
  SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_grams,
       COUNT(*) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_count,
       CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c) AS dup_ratio
FROM gc GROUP BY doc_id"""

  /** Mirror of TextOps.mixtureWeights: α = 0.5 temperature mixing;
    * the normalizing total is list_reduce over the source-ORDERED
    * weight list — a left fold matching Spark's aggregate() — so the
    * double total is bit-identical, never an unordered SUM. */
  val corpusMixture: String = """
WITH t AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(list_sum(list_transform(string_split(text, ' '),
           w -> (length(w) + 3) // 4))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
w AS (SELECT source, n_docs, n_tokens,
             sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM t),
tot AS (SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b) AS total FROM w)
SELECT w.source, w.n_docs, w.n_tokens, w.w / tot.total AS weight
FROM w, tot"""

  /** Mirror of TextOps.lengthHistogram (width 50, cap 9). */
  val textLengthHistogram: String = """
WITH t AS (
  SELECT lang,
         CAST(list_sum(list_transform(string_split(text, ' '),
           w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens
  FROM documents),
b AS (SELECT lang, least(n_tokens // 50, 9) AS bucket, n_tokens FROM t)
SELECT lang, bucket, CAST(bucket * 50 AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
FROM b GROUP BY lang, bucket"""

  /** Mirror of TextOps.tfidfTerms(k=3): integer-bit idf from
    * length(bin(n)), per-doc top-3 with ties on the term string. */
  val textTfidf: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
sc AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * CAST(length(bin(n.n_docs)) - length(bin(d.df)) AS BIGINT) AS tfidf_bits
  FROM tf t JOIN dfq d USING (term) CROSS JOIN nd n)
SELECT doc_id, rank, term, tf, df, tfidf_bits FROM (
  SELECT doc_id, term, tf, df, tfidf_bits,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_bits DESC, term) AS rank
  FROM sc)
WHERE rank <= 3"""

  /** Mirror of TextOps.mixtureSample: the corpusMixture weights nested
    * as a derived table, hashSample's md5 bucket rule, explicit floor()
    * on the threshold (raw double→int casts round differently across
    * engines). */
  def corpusMixtureSample: String = s"""
WITH wt AS (
  SELECT source, CAST(floor(weight * 1000000) AS BIGINT) AS keep_bound
  FROM ($corpusMixture))
SELECT d.doc_id, d.source, wt.keep_bound
FROM documents d JOIN wt USING (source)
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
      < wt.keep_bound"""

  val textFingerprint: String = """
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
sh AS (
  SELECT doc_id,
         array_to_string(t[i:i+2], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(n - 2, 1) + 1)) u(i))
SELECT k.doc_id,
       md5(k.text) AS content_md5,
       (SELECT min(md5(s)) FROM sh WHERE sh.doc_id = k.doc_id) AS min_shingle_md5,
       k.n AS n_tokens
FROM toks k"""

  /** Mirror of functions.RollingMinHash: each 16-byte window's polynomial
    * hash recomputed independently (the Spark side rolls in O(1) per
    * byte; the modular arithmetic makes both forms identical). Power
    * table = 257^(15-j) mod 1e9+7. Documents are ASCII (verified:
    * length == octet_length), so ascii(substr) = the UTF-8 byte. */
  val textRollingFingerprint: String = """
WITH w AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 16),
           j -> CAST(ascii(substr(text, CAST(i AS INT) + CAST(j AS INT), 1)) AS BIGINT) *
                [771861642,469929426,13501671,326900787,966252539,108818104,447894237,383065739,13163680,805498697,154885210,362470373,16974593,66049,257,1][CAST(j AS INT) + 1]))
           % 1000000007 AS BIGINT) AS h
  FROM documents, UNNEST(range(1, length(text) - 16 + 2)) t(i))
SELECT doc_id, min(h) AS min_rolling_hash,
       CAST(count(*) AS INT) AS n_windows
FROM w GROUP BY doc_id"""

  // ---------------------------------------------------------------- dedup

  val dedupExact: String = """
SELECT doc_id, md5(text) AS content_md5,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size,
       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents"""

  /** Shared shingle CTEs for the minhash / ngram oracles. */
  private val shingleCtes: String = """
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
sh AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(n - 2, 1) + 1)) u(i)),
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
dsz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id)"""

  /** Shared minhash signature CTEs (must stay bit-identical to
    * DedupOps.minhashSignatures' double-hash family): one md5 per
    * shingle split into h1/h2, then sig(doc_id, j, mh) for the first
    * `nHashes` hash functions. ONE definition — four oracles
    * (minhash, clusters, incremental-near, band0-blocked ngram) build
    * on it, so a NumHashes/HashPrime change edits one place. */
  private def minhashSigCtes(nHashes: Int): String = s""",
hashes AS (
  SELECT doc_id, s,
         ('0x' || substr(md5(s), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(s), 9, 8))::BIGINT AS h2
  FROM sh),
sig AS (
  SELECT doc_id, j,
         min((h1 + j * h2) % 4294967311) AS mh
  FROM hashes, UNNEST(range(0, $nHashes)) t(j)
  GROUP BY doc_id, j)"""

  /** Band keys over `sig` — BandSize-2 '|'-joined signature pairs. */
  private val minhashBandCtes: String = """,
bands AS (
  SELECT doc_id, j // 2 AS b,
         string_agg(CAST(mh AS VARCHAR), '|' ORDER BY j) AS band
  FROM sig GROUP BY doc_id, j // 2)"""

  val dedupMinhash: String = shingleCtes + minhashSigCtes(8) + minhashBandCtes + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) AS jaccard
FROM inter i
JOIN dsz za ON za.doc_id = i.doc_a
JOIN dsz zb ON zb.doc_id = i.doc_b
WHERE CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) >= 0.5"""

  /** Mirror of DedupOps.minhashEstimateEvalFrom. The candidate join
    * matches band index AND band string (the Spark side prefixes the
    * index onto the bucket key); zero-intersection candidates survive
    * via the left join + coalesce. */
  val dedupMinhashEst: String = shingleCtes + minhashSigCtes(8) + minhashBandCtes + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.band = b.band AND a.doc_id < b.doc_id),
m AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS matches
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
  GROUP BY c.doc_a, c.doc_b),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b)
SELECT m.doc_a, m.doc_b, CAST(m.matches AS INT) AS matches,
       CAST(m.matches AS DOUBLE) / 8 AS est_jaccard,
       CAST(COALESCE(i.ni, 0) AS DOUBLE)
         / CAST(za.n + zb.n - COALESCE(i.ni, 0) AS DOUBLE) AS jaccard,
       abs(CAST(m.matches AS DOUBLE) / 8
           - CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / CAST(za.n + zb.n - COALESCE(i.ni, 0) AS DOUBLE)) AS abs_err
FROM m
LEFT JOIN inter i ON i.doc_a = m.doc_a AND i.doc_b = m.doc_b
JOIN dsz za ON za.doc_id = m.doc_a
JOIN dsz zb ON zb.doc_id = m.doc_b"""

  /** Connected components over the minhash pair graph: recursive
    * transitive closure (tiny graph — pairs above threshold), component
    * id = min reachable doc_id, singletons via the documents left join.
    * Mirrors DedupOps.nearDupClusters' converged label propagation.
    * The CTE chain through `lab` (doc_id → cluster_id) is shared with
    * the corpus_clean composite below. */
  private val clusterLabCtes: String = shingleCtes.replaceFirst("WITH toks", "WITH RECURSIVE toks") + minhashSigCtes(8) + minhashBandCtes + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN dsz za ON za.doc_id = i.doc_a
  JOIN dsz zb ON zb.doc_id = i.doc_b
  WHERE CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) >= 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
comp AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
lab AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)"""

  val dedupClusters: String = clusterLabCtes + """
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM lab"""

  /** Mirror of TextOps.leakageSafeSplits: the sampleSplits residue
    * formula applied to the near-dup cluster representative (the
    * `lab` CTE's cluster_id) instead of the doc_id, per-split doc /
    * distinct-cluster / char totals. */
  val sampleSplitsSafe: String = clusterLabCtes + """
SELECT split, COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT cluster_id)::BIGINT AS n_clusters,
       SUM(n_chars)::BIGINT AS n_chars
FROM (
  SELECT l.cluster_id, d.n_chars,
         ('0x' || substr(md5(CAST(l.cluster_id AS VARCHAR)), 1, 8))::BIGINT
           % 100 AS res
  FROM lab l JOIN documents d ON d.doc_id = l.doc_id) t
CROSS JOIN LATERAL (SELECT CASE WHEN res < 80 THEN 'train'
                                WHEN res < 90 THEN 'valid'
                                ELSE 'test' END AS split) s
GROUP BY split"""

  /** Mirror of TextOps.splitLeakage: both split policies re-derived
    * over `lab`, cross-split pair counts over the verified near-dup
    * `pairs` edge list. leaked_safe must come out 0 — the oracle
    * recomputes it rather than asserting it. */
  val sampleSplitLeakage: String = clusterLabCtes + """,
sp AS (
  SELECT doc_id,
         CASE WHEN nd < 80 THEN 'train' WHEN nd < 90 THEN 'valid'
              ELSE 'test' END AS naive_split,
         CASE WHEN nc < 80 THEN 'train' WHEN nc < 90 THEN 'valid'
              ELSE 'test' END AS safe_split
  FROM (
    SELECT doc_id, cluster_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 100 AS nd,
           ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
             % 100 AS nc
    FROM lab) t)
SELECT COUNT(*)::BIGINT AS n_pairs,
       SUM(CASE WHEN a.naive_split <> b.naive_split THEN 1 ELSE 0 END)::BIGINT
         AS leaked_naive,
       SUM(CASE WHEN a.safe_split <> b.safe_split THEN 1 ELSE 0 END)::BIGINT
         AS leaked_safe
FROM pairs p
JOIN sp a ON a.doc_id = p.doc_a
JOIN sp b ON b.doc_id = p.doc_b"""

  /** The minhash verified-pair CTE chain alone (threshold 0.5) — the
    * edge list the graph-statistic oracles build on. */
  private val pairsCtes: String = shingleCtes + minhashSigCtes(8) + minhashBandCtes + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN dsz za ON za.doc_id = i.doc_a
  JOIN dsz zb ON zb.doc_id = i.doc_b
  WHERE CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) >= 0.5)"""

  /** Mirror of Graph.triangleStats over the minhash near-dup pairs:
    * same (degree, id) orientation, same forward-count triple join,
    * same integer wedge sum and single final division. */
  val dedupGraphTriangles: String = pairsCtes + """,
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT doc_a AS id FROM pairs
    UNION ALL SELECT doc_b FROM pairs) GROUP BY id),
o AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b)
              THEN p.doc_a ELSE p.doc_b END AS src,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b)
              THEN p.doc_b ELSE p.doc_a END AS dst
  FROM pairs p
  JOIN deg da ON da.id = p.doc_a
  JOIN deg db ON db.id = p.doc_b),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM o o1
  JOIN o o2 ON o2.src = o1.src AND o2.dst <> o1.dst
  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst),
vw AS (
  SELECT COUNT(*) AS n_vertices,
         CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg),
ne AS (SELECT COUNT(*) AS n_edges FROM pairs)
SELECT vw.n_vertices, ne.n_edges, vw.n_wedges, t.n_triangles,
       CASE WHEN vw.n_wedges > 0
            THEN CAST(3.0 AS DOUBLE) * t.n_triangles / vw.n_wedges
            ELSE CAST(0.0 AS DOUBLE) END
         AS global_clustering
FROM ne, vw, tri t"""

  /** Mirror of ext.Corpus.cleanDecisions: the dedup-cluster labeling
    * (shared CTE chain), exact-dup flag, and quality score fused into
    * the first-matching-reason cascade. */
  val corpusClean: String = clusterLabCtes + s""",
exact AS (
  SELECT doc_id,
         doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_exact_dup
  FROM documents),
qual AS (
  SELECT doc_id,
         least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100) * 0.4
         + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) * 0.4
         + least(1.0, CAST(${occ("the ", 4)} + ${occ("a ", 2)} AS DOUBLE) / 5) * 0.2
           AS quality_score
  FROM documents)
SELECT doc_id, lang, cluster_id, reason, reason = 'keep' AS keep
FROM (
  SELECT d.doc_id, d.lang, l.cluster_id,
         CASE WHEN e.is_exact_dup THEN 'exact_duplicate'
              WHEN l.doc_id <> l.cluster_id THEN 'near_duplicate'
              WHEN q.quality_score < 0.5 THEN 'low_quality'
              ELSE 'keep' END AS reason
  FROM documents d
  JOIN exact e ON e.doc_id = d.doc_id
  JOIN lab l ON l.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id)"""

  /** Mirror of Corpus.dedupReport: the cluster labeling chain shared
    * with corpus_clean, exact-dup flags, per-lang integer counts and
    * single-division rates. */
  val corpusDedupReport: String = clusterLabCtes + """,
exact AS (
  SELECT doc_id,
         doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_exact
  FROM documents)
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN e.is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
       CAST(SUM(CASE WHEN l.doc_id <> l.cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups,
       CAST(SUM(CASE WHEN e.is_exact THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS exact_rate,
       CAST(SUM(CASE WHEN l.doc_id <> l.cluster_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS near_rate
FROM documents d
JOIN exact e ON e.doc_id = d.doc_id
JOIN lab l ON l.doc_id = d.doc_id
GROUP BY d.lang"""

  private val simhashCtes: String = """
WITH dtok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM dtok),
bitsum AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS contrib
  FROM th, UNNEST(range(0, 32)) t(b)
  GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN contrib > 0 THEN (1::BIGINT << b) ELSE 0 END)
              AS BIGINT) AS simhash32
  FROM bitsum GROUP BY doc_id)"""

  val dedupSimhash: String = simhashCtes + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash32
FROM sig a JOIN sig b ON a.simhash32 = b.simhash32 AND a.doc_id < b.doc_id"""

  /** Brute-force all-pairs hamming join over the COMPACT 32-bit
    * signature (the saturating demo form — see BENCH_TREND r11) —
    * independent of the Spark side's banded probe, which is exact for
    * k ≤ 3 by pigeonhole, so the two must agree row-for-row.
    * Quadratic is fine at oracle SF. */
  val dedupSimhashCompact: String = simhashCtes + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash32, b.simhash32)) <= 3"""

  /** 60-bit signature CTEs (first 15 md5 hex digits per distinct
    * token — positive in a signed BIGINT), shared by the wide-simhash
    * mirrors below. */
  private val simhash60Ctes: String = """
WITH dtok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM dtok),
bitsum AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS contrib
  FROM th, UNNEST(range(0, 60)) t(b)
  GROUP BY doc_id, b),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN contrib > 0 THEN (1::BIGINT << b) ELSE 0 END)
              AS BIGINT) AS simhash60
  FROM bitsum GROUP BY doc_id)"""

  private def simhash60Pairs(k: Int): String = simhash60Ctes + s"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash60, b.simhash60)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash60, b.simhash60)) <= $k"""

  /** Mirror of DedupOps.simhash60HammingPairs at the default k = 3 —
    * the scale-safe signature now answers the default `dedup_simhash_k`
    * query; brute-force hamming join independent of the Spark side's
    * 6×10-bit banded probe. */
  val dedupSimhashK: String = simhash60Pairs(3)

  /** The wide probe at its pigeonhole exactness bound, k = 5. */
  val dedupSimhashWide: String = simhash60Pairs(5)

  /** Mirror of DedupOps.ngramJaccardPairs: single-band minhash
    * blocking (band 0 = minhash values j=0,1, the '|'-joined prefix of
    * the full LSH signature) + exact 3-gram Jaccard verify at 0.3. */
  val dedupNgram: String = shingleCtes + minhashSigCtes(2) + """,
keyed AS (
  SELECT doc_id, string_agg(CAST(mh AS VARCHAR), '|' ORDER BY j) AS block_key
  FROM sig GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) AS jaccard
FROM inter i
JOIN dsz za ON za.doc_id = i.doc_a
JOIN dsz zb ON zb.doc_id = i.doc_b
WHERE CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) >= 0.3"""

  /** Mirror of DedupOps.editDistancePairsFrom: band-0 minhash
    * candidates + unit-cost levenshtein over the 80-char prefix,
    * threshold 20 — Wagner-Fischer is exact integer in both engines. */
  val dedupEditdist: String = shingleCtes + minhashSigCtes(2) + """,
keyed AS (
  SELECT doc_id, string_agg(CAST(mh AS VARCHAR), '|' ORDER BY j) AS block_key
  FROM sig GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(edit_dist AS INT) AS edit_dist FROM (
  SELECT c.doc_a, c.doc_b,
         levenshtein(substr(da.text, 1, 80), substr(db.text, 1, 80))
           AS edit_dist
  FROM cand c
  JOIN documents da ON da.doc_id = c.doc_a
  JOIN documents db ON db.doc_id = c.doc_b)
WHERE edit_dist <= 20"""

  /** Mirror of DedupOps.containmentPairs: the dedupNgram candidate
    * chain (band-0 minhash blocking + relational intersection count)
    * with containment normalization — ni/n per side, max as the pair
    * score, threshold 0.6. Each containment is one int64→double
    * conversion pair and one IEEE division — bit-identical across
    * engines. */
  val dedupContainment: String = shingleCtes + minhashSigCtes(2) + """,
keyed AS (
  SELECT doc_id, string_agg(CAST(mh AS VARCHAR), '|' ORDER BY j) AS block_key
  FROM sig GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, cont_in_b, cont_in_a,
       greatest(cont_in_a, cont_in_b) AS containment
FROM (
  SELECT i.doc_a, i.doc_b,
         CAST(ni AS DOUBLE) / CAST(za.n AS DOUBLE) AS cont_in_b,
         CAST(ni AS DOUBLE) / CAST(zb.n AS DOUBLE) AS cont_in_a
  FROM inter i
  JOIN dsz za ON za.doc_id = i.doc_a
  JOIN dsz zb ON zb.doc_id = i.doc_b)
WHERE greatest(cont_in_a, cont_in_b) >= 0.6"""

  /** Mirror of Graph.kCore over the verified minhash pair graph:
    * 3 peel rounds unrolled — per round the degree aggregate, the
    * deg ≥ 2 survivor filter, and the induced-subgraph semi joins —
    * then final induced degrees. */
  val dedupKcore: String = {
    def peel(i: Int): String = s""",
d$i AS (SELECT src, COUNT(*) AS deg FROM e${i - 1} GROUP BY src),
s$i AS (SELECT src AS v FROM d$i WHERE deg >= 2),
e$i AS (
  SELECT e.src, e.dst FROM e${i - 1} e
  WHERE e.src IN (SELECT v FROM s$i) AND e.dst IN (SELECT v FROM s$i))"""
    s"""
WITH kc_pairs AS (
  SELECT doc_a, doc_b FROM ($dedupMinhash)),
e0 AS (
  SELECT doc_a AS src, doc_b AS dst FROM kc_pairs
  UNION ALL SELECT doc_b, doc_a FROM kc_pairs)""" +
      (1 to 3).map(peel).mkString + """
SELECT src AS doc_id, COUNT(*)::BIGINT AS deg FROM e3 GROUP BY src"""
  }

  /** Mirror of Graph.labelPropagation over the verified minhash pair
    * graph: 3 synchronous rounds unrolled, plurality vote per vertex
    * via row_number (count DESC, label ASC — the same total order as
    * the Spark side's max(struct(cnt, -label))). */
  val dedupCommunities: String = {
    def round(i: Int): String = s""",
v$i AS (
  SELECT e.dst, l.label, COUNT(*) AS cnt
  FROM e0 e JOIN l${i - 1} l ON l.id = e.src
  GROUP BY e.dst, l.label),
b$i AS (
  SELECT dst AS id, label AS vote FROM (
    SELECT dst, label,
           row_number() OVER (PARTITION BY dst
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM v$i) x WHERE rn = 1),
l$i AS (
  SELECT l.id, COALESCE(b.vote, l.label) AS label
  FROM l${i - 1} l LEFT JOIN b$i b ON b.id = l.id)"""
    s"""
WITH lp_pairs AS (
  SELECT doc_a, doc_b FROM ($dedupMinhash)),
e0 AS (
  SELECT doc_a AS src, doc_b AS dst FROM lp_pairs
  UNION ALL SELECT doc_b, doc_a FROM lp_pairs),
l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents)""" +
      (1 to 3).map(round).mkString + """
SELECT l.id AS doc_id, l.label AS community, s.community_size
FROM l3 l
JOIN (SELECT label AS community, COUNT(*)::BIGINT AS community_size
      FROM l3 GROUP BY label) s ON s.community = l.label"""
  }

  /** Mirror of DedupOps.nearDupPageRank (3 iterations, scale 10¹²):
    * the minhash pair chain nested as a derived table, then the power
    * iteration unrolled — every division has non-negative operands so
    * `//` here and Spark's `div` agree. */
  val dedupPagerank: String = {
    val base = s"""
WITH pr_pairs AS (
  SELECT doc_a, doc_b FROM ($dedupMinhash)),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pr_pairs
  UNION ALL SELECT doc_b, doc_a FROM pr_pairs),
dg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM documents),
r0 AS (
  SELECT d.doc_id AS id, 1000000000000 // nn.n AS r
  FROM documents d CROSS JOIN nn)"""
    // Each round mirrors Graph.pageRankDirected: dangling mass (rank on
    // out-degree-0 nodes — the isolated docs of the symmetrized pair
    // graph) redistributes uniformly as `dm // n` inside the damped term.
    val rounds = (1 to 3).map { i =>
      s""",
d$i AS (
  SELECT COALESCE(SUM(r.r), 0) AS dm
  FROM r${i - 1} r LEFT JOIN dg g ON g.src = r.id WHERE g.src IS NULL),
i$i AS (
  SELECT e.dst AS id, SUM(r.r // g.deg) AS inflow
  FROM edges e JOIN r${i - 1} r ON r.id = e.src JOIN dg g ON g.src = e.src
  GROUP BY e.dst),
r$i AS (
  SELECT b.id,
         (15 * (1000000000000 // nn.n)) // 100
         + (85 * (COALESCE(i$i.inflow, 0) + d$i.dm // nn.n)) // 100 AS r
  FROM r0 b CROSS JOIN nn CROSS JOIN d$i LEFT JOIN i$i ON i$i.id = b.id)"""
    }.mkString
    base + rounds + """
SELECT id AS doc_id, CAST(r AS BIGINT) AS rank_scaled FROM r3"""
  }

  /** Mirror of DedupOps.incrementalNewDocs: odd-doc_id incoming docs
    * whose content hash is absent from the even-doc_id snapshot. */
  val dedupIncremental: String = """
SELECT d.doc_id, md5(d.text) AS content_md5
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents s
    WHERE s.doc_id % 2 = 0 AND md5(s.text) = md5(d.text))"""

  /** Mirror of DedupOps.incrementalNewNearDocs: incoming (odd) docs
    * with no verified minhash near-dup among the snapshot (even) docs.
    * Bipartite band join for candidates, exact Jaccard verify. */
  val dedupIncrementalNear: String = shingleCtes + minhashSigCtes(8) + minhashBandCtes + """,
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.b = b.b
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ni
  FROM cand c
  JOIN dsh x ON x.doc_id = c.doc_a
  JOIN dsh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY c.doc_a, c.doc_b),
dup AS (
  SELECT DISTINCT i.doc_a AS doc_id
  FROM inter i
  JOIN dsz za ON za.doc_id = i.doc_a
  JOIN dsz zb ON zb.doc_id = i.doc_b
  WHERE CAST(ni AS DOUBLE) / CAST(za.n + zb.n - ni AS DOUBLE) >= 0.5)
SELECT d.doc_id
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.doc_id = d.doc_id)"""

  /** Mirror of EventOps.topEventTypes (typed TopKAggregator): the
    * row_number form of the same (count desc, type asc) contract. */
  /** Mirror of EventOps.funnel(view → click → purchase) over the same
    * deterministic 1-in-5 event sample: per-stage min-after-previous,
    * depth by the deepest non-null timestamp. */
  val eventsFunnel: String = """
WITH ev AS (SELECT * FROM events WHERE event_id % 5 = 0),
s1 AS (
  SELECT user_id, min(ts) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT s1.user_id, s1.t1,
         min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
  FROM s1 LEFT JOIN ev e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
  GROUP BY s1.user_id, s1.t1),
s3 AS (
  SELECT s2.user_id, s2.t2,
         min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
  FROM s2 LEFT JOIN ev e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
  GROUP BY s2.user_id, s2.t2)
SELECT CASE WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            ELSE 1 END AS funnel_stage,
       count(*) AS n_users
FROM s3 GROUP BY 1"""

  /** Mirror of EventOps.sessionFunnel (30-min gap, view→click→purchase):
    * lag + running-sum sessionization, then the funnel chain keyed by
    * (user, session). */
  val eventsSessionFunnel: String = """
WITH ord AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, event_id, event_type, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ord),
s1 AS (
  SELECT user_id, session_id, min(ts) AS t1 FROM sess
  WHERE event_type = 'view' GROUP BY user_id, session_id),
s2 AS (
  SELECT s1.user_id, s1.session_id, s1.t1,
         min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
  FROM s1 LEFT JOIN sess e
    ON e.user_id = s1.user_id AND e.session_id = s1.session_id
   AND e.event_type = 'click'
  GROUP BY s1.user_id, s1.session_id, s1.t1),
s3 AS (
  SELECT s2.user_id, s2.session_id, s2.t2,
         min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
  FROM s2 LEFT JOIN sess e
    ON e.user_id = s2.user_id AND e.session_id = s2.session_id
   AND e.event_type = 'purchase'
  GROUP BY s2.user_id, s2.session_id, s2.t2)
SELECT CASE WHEN t3 IS NOT NULL THEN 3
            WHEN t2 IS NOT NULL THEN 2
            ELSE 1 END AS funnel_stage,
       count(*) AS n_sessions
FROM s3 GROUP BY 1"""

  /** Mirror of EventOps.retentionCohorts: integer week keys, one
    * double division per output row. */
  val eventsRetention: String = """
WITH weekly AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1992-01-01', CAST(ts AS DATE)) // 7 AS week
  FROM events),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id),
counts AS (
  SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
         count(*) AS n_active
  FROM weekly w JOIN cohort c ON c.user_id = w.user_id
  GROUP BY c.cohort_week, w.week - c.cohort_week),
sizes AS (
  SELECT cohort_week, n_active AS cohort_size FROM counts WHERE week_offset = 0)
SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
       CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
FROM counts c JOIN sizes s ON s.cohort_week = c.cohort_week"""

  val eventsTopTypes: String = """
SELECT rank, event_type FROM (
  SELECT event_type,
         row_number() OVER (ORDER BY count(*) DESC, event_type) AS rank
  FROM events GROUP BY event_type)
WHERE rank <= 3"""

  // ----------------------------------------------------------- multimodal

  /** Mirror of MultiModal.mediaTable + decodeStub over ASCII payloads:
    * byte values are code points, md5 of the text equals md5 of its
    * UTF-8 bytes. */
  val mmFeatures: String = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       CAST(length(text) AS INT) AS byte_len,
       md5(text) AS content_hash,
       CAST(list_sum(list_transform(range(1, 17), i -> ascii(substr(text, i, 1))))
            AS DOUBLE) / 16 AS brightness,
       ascii(substr(text, 1, 1)) / 255.0 AS f0,
       ascii(substr(text, 2, 1)) / 255.0 AS f1,
       ascii(substr(text, 3, 1)) / 255.0 AS f2,
       ascii(substr(text, 4, 1)) / 255.0 AS f3
FROM documents"""

  val mmResize: String = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       CAST(n_chars % 640 + 64 AS INT) AS width,
       CAST(n_chars % 480 + 48 AS INT) AS height,
       CAST(CASE WHEN (n_chars % 640 + 64) >= (n_chars % 480 + 48) THEN 224
                 ELSE ((n_chars % 640 + 64) * 224) // (n_chars % 480 + 48)
            END AS INT) AS target_w,
       CAST(CASE WHEN (n_chars % 640 + 64) >= (n_chars % 480 + 48)
                 THEN ((n_chars % 480 + 48) * 224) // (n_chars % 640 + 64)
                 ELSE 224 END AS INT) AS target_h
FROM documents"""

  /** Mirror of MultiModal.frameStats — but NOT by parsing the binary:
    * the oracle recomputes each sampled frame's channel sums from the
    * pixel formula (MultiModal.framePixelOf) and the container
    * metadata from the geometry formulas (geomOf/videoGeomOf). The
    * Spark side reports what VideoCodec PARSED out of real AVI bytes
    * (RIFF lists, stream headers, JUNK skip + pad byte, bottom-up DIB
    * frames), so equality verifies the full encode→decode roundtrip
    * pixel-exactly per frame. */
  val mmFrames: String = """
WITH v AS (
  SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h,
         doc_id % 5 + 2 AS nf, 40000 + (doc_id % 3) * 10000 AS uspf
  FROM documents WHERE doc_id % 3 = 2),
fr AS (
  SELECT v.doc_id, v.w, v.h, v.nf, v.uspf, t.f
  FROM v, UNNEST(range(0, v.nf, 2)) t(f)),
px AS (
  SELECT fr.doc_id, fr.f,
         SUM((fr.doc_id * 31 + fr.f * 19 + t.p * 7) % 256) AS sum_r,
         SUM((fr.doc_id * 17 + fr.f * 23 + t.p * 11) % 256) AS sum_g,
         SUM((fr.doc_id * 13 + fr.f * 29 + t.p * 5) % 256) AS sum_b
  FROM fr, UNNEST(range(0, fr.w * fr.h)) t(p)
  GROUP BY fr.doc_id, fr.f)
SELECT fr.doc_id, CAST(fr.nf AS INT) AS n_frames, CAST(fr.f AS INT) AS frame_idx,
       CAST(fr.w AS INT) AS width, CAST(fr.h AS INT) AS height,
       CAST(fr.nf * fr.uspf AS BIGINT) AS duration_us,
       CAST(p.sum_r AS BIGINT) AS sum_r,
       CAST(p.sum_g AS BIGINT) AS sum_g,
       CAST(p.sum_b AS BIGINT) AS sum_b,
       CAST((p.sum_r + p.sum_g + p.sum_b) // (3 * fr.w * fr.h) AS BIGINT) AS brightness_q
FROM fr JOIN px p ON p.doc_id = fr.doc_id AND p.f = fr.f"""

  /** Mirror of MultiModal.frameStatsMjpeg: the clips carry per-frame
    * CONSTANT gray (mjpegGrayOf), so every 8×8 block is DC-only and
    * the baseline-JPEG round trip is exact — the oracle recomputes
    * each sampled frame's sums as w·h·gray arithmetically while the
    * Spark side reports what a FULL JPEG decode (Huffman, dequantize,
    * IDCT) parsed out of real MJPEG-AVI bytes. brightness_q =
    * (3·g·w·h) // (3·w·h) = g exactly. */
  val mmFramesMjpeg: String = """
WITH v AS (
  SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h,
         doc_id % 5 + 2 AS nf, 40000 + (doc_id % 3) * 10000 AS uspf
  FROM documents WHERE doc_id % 3 = 2),
fr AS (
  SELECT v.doc_id, v.w, v.h, v.nf, v.uspf, t.f,
         (v.doc_id * 37 + t.f * 41) % 256 AS g
  FROM v, UNNEST(range(0, v.nf, 2)) t(f))
SELECT fr.doc_id, CAST(fr.nf AS INT) AS n_frames, CAST(fr.f AS INT) AS frame_idx,
       CAST(fr.w AS INT) AS width, CAST(fr.h AS INT) AS height,
       CAST(fr.nf * fr.uspf AS BIGINT) AS duration_us,
       CAST(fr.w * fr.h * fr.g AS BIGINT) AS sum_r,
       CAST(fr.w * fr.h * fr.g AS BIGINT) AS sum_g,
       CAST(fr.w * fr.h * fr.g AS BIGINT) AS sum_b,
       CAST(fr.g AS BIGINT) AS brightness_q
FROM fr"""

  /** Mirror of MultiModal.decodedJpegFeatures: the stills carry
    * per-8×8-block constant gray (jpegBlockGrayOf), so the lossy
    * baseline-JPEG round trip is exact and the oracle recomputes each
    * channel sum from the block formula over the pixel range — while
    * the Spark side reports what a full JPEG decode (gray and color,
    * 4:2:0/4:4:4, DRI variants) parsed out of real bytes. */
  val mmDecodeJpeg: String = """
WITH v AS (
  SELECT doc_id, 8 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 2) * 7 AS h
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  SELECT v.doc_id,
         SUM((v.doc_id * 19 + ((t.p % v.w) // 8) * 47
              + ((t.p // v.w) // 8) * 89) % 256) AS s
  FROM v, UNNEST(range(0, v.w * v.h)) t(p)
  GROUP BY v.doc_id)
SELECT v.doc_id, 'jpeg' AS format,
       CAST(v.w AS INT) AS width, CAST(v.h AS INT) AS height,
       CAST(v.w * v.h AS BIGINT) AS n_pixels,
       CAST(p.s AS BIGINT) AS sum_r,
       CAST(p.s AS BIGINT) AS sum_g,
       CAST(p.s AS BIGINT) AS sum_b,
       CAST((3 * p.s) // (3 * v.w * v.h) AS BIGINT) AS brightness_q
FROM v JOIN px p ON p.doc_id = v.doc_id"""

  /** Mirror of MultiModal.decodedFeatures — but NOT by parsing the
    * binary: the oracle recomputes each channel sum from the pixel
    * formula (MultiModal.pixelOf) the synthesizer encoded. The Spark
    * side reports what ImageCodec PARSED out of real BMP/PPM bytes, so
    * equality here verifies the full encode→decode roundtrip (header
    * offsets, BGR order, bottom-up rows, padding) pixel-exactly. */
  val mmDecode: String = """
WITH img AS (
  SELECT doc_id, doc_id % 6 + 2 AS w, doc_id % 4 + 2 AS h,
         CASE WHEN doc_id % 6 = 0 THEN 'bmp' ELSE 'ppm' END AS format
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  SELECT i.doc_id,
         SUM((i.doc_id * 31 + t.p * 7) % 256) AS sum_r,
         SUM((i.doc_id * 17 + t.p * 11) % 256) AS sum_g,
         SUM((i.doc_id * 13 + t.p * 5) % 256) AS sum_b
  FROM img i, UNNEST(range(0, i.w * i.h)) t(p)
  GROUP BY i.doc_id)
SELECT i.doc_id, i.format, CAST(i.w AS INT) AS width,
       CAST(i.h AS INT) AS height,
       CAST(i.w * i.h AS BIGINT) AS n_pixels,
       CAST(p.sum_r AS BIGINT) AS sum_r,
       CAST(p.sum_g AS BIGINT) AS sum_g,
       CAST(p.sum_b AS BIGINT) AS sum_b,
       CAST((p.sum_r + p.sum_g + p.sum_b) // (3 * i.w * i.h) AS BIGINT) AS brightness_q
FROM img i JOIN px p ON p.doc_id = i.doc_id"""

  /** Mirror of MultiModal.decodedGifFeatures: geometry + palette-index
    * arithmetic replayed over range(0, w·h). The Spark side reports
    * what GifCodec PARSED out of real LZW-compressed GIF87a bytes, so
    * equality verifies header parse, variable-width LZW decompression,
    * sub-block reassembly, and palette mapping pixel-exactly. */
  val mmDecodeGif: String = """
WITH img AS (
  SELECT doc_id, 10 + (doc_id % 5) * 6 AS w, 8 + (doc_id % 3) * 9 AS h
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  SELECT i.doc_id,
         SUM((i.doc_id * 31 + t.p * 5) % 256) AS sum_r,
         SUM(((i.doc_id * 31 + t.p * 5) % 256 * 7) % 256) AS sum_g,
         SUM(((i.doc_id * 31 + t.p * 5) % 256 * 13) % 256) AS sum_b
  FROM img i, UNNEST(range(0, i.w * i.h)) t(p)
  GROUP BY i.doc_id)
SELECT i.doc_id, 'gif' AS format, CAST(i.w AS INT) AS width,
       CAST(i.h AS INT) AS height,
       CAST(i.w * i.h AS BIGINT) AS n_pixels,
       CAST(p.sum_r AS BIGINT) AS sum_r,
       CAST(p.sum_g AS BIGINT) AS sum_g,
       CAST(p.sum_b AS BIGINT) AS sum_b,
       CAST((p.sum_r + p.sum_g + p.sum_b) // (3 * i.w * i.h) AS BIGINT)
         AS brightness_q
FROM img i JOIN px p ON p.doc_id = i.doc_id"""

  /** Mirror of MultiModal.decodedPngFeatures: same pixel formula as
    * mm_decode (MultiModal.pixelOf), PNG geometry. The Spark side
    * reports what PngCodec PARSED out of real DEFLATE+filtered bytes,
    * so equality verifies signature/CRC/inflate/unfilter exactly. */
  val mmDecodePng: String = """
WITH img AS (
  SELECT doc_id, 9 + (doc_id % 4) * 5 AS w, 6 + (doc_id % 5) * 3 AS h
  FROM documents WHERE doc_id % 3 = 0),
px AS (
  SELECT i.doc_id,
         SUM((i.doc_id * 31 + t.p * 7) % 256) AS sum_r,
         SUM((i.doc_id * 17 + t.p * 11) % 256) AS sum_g,
         SUM((i.doc_id * 13 + t.p * 5) % 256) AS sum_b
  FROM img i, UNNEST(range(0, i.w * i.h)) t(p)
  GROUP BY i.doc_id)
SELECT i.doc_id, 'png' AS format, CAST(i.w AS INT) AS width,
       CAST(i.h AS INT) AS height,
       CAST(i.w * i.h AS BIGINT) AS n_pixels,
       CAST(p.sum_r AS BIGINT) AS sum_r,
       CAST(p.sum_g AS BIGINT) AS sum_g,
       CAST(p.sum_b AS BIGINT) AS sum_b,
       CAST((p.sum_r + p.sum_g + p.sum_b) // (3 * i.w * i.h) AS BIGINT)
         AS brightness_q
FROM img i JOIN px p ON p.doc_id = i.doc_id"""

  /** Mirror of MultiModal.decodedAudio: recomputes the decoded-sample
    * statistics from the generation formula (MultiModal.sampleOf /
    * audioGeomOf). The Spark side reports what AudioCodec PARSED out of
    * real RIFF/WAVE bytes (chunk walk, pad bytes, LE int16), so
    * equality verifies the full encode→decode roundtrip sample-exactly.
    * Zero crossings pair each sample with its predecessor via lag();
    * the first sample has none (NULL comparison → CASE else-branch). */
  val mmAudio: String = """
WITH a AS (
  SELECT doc_id, doc_id % 50 + 20 AS n, 8000 + (doc_id % 4) * 4000 AS rate
  FROM documents WHERE doc_id % 3 = 1),
s AS (
  SELECT a.doc_id, t.i, (a.doc_id * 37 + t.i * 13) % 65536 - 32768 AS v
  FROM a, UNNEST(range(0, a.n)) t(i)),
st AS (
  SELECT doc_id, COUNT(*) AS n_samples,
         CAST(MAX(abs(v)) AS BIGINT) AS peak_abs,
         CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
         CAST(SUM(v * v) AS BIGINT) AS energy
  FROM s GROUP BY doc_id),
zc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN (v < 0) <> (pv < 0) THEN 1 ELSE 0 END)
              AS BIGINT) AS zero_crossings
  FROM (SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM s)
  GROUP BY doc_id)
SELECT a.doc_id,
       CAST(a.rate AS BIGINT) AS sample_rate,
       st.n_samples,
       CAST(st.n_samples * 1000000 // a.rate AS BIGINT) AS duration_us,
       st.peak_abs, st.sum_abs, st.energy, zc.zero_crossings
FROM a
JOIN st ON st.doc_id = a.doc_id
JOIN zc ON zc.doc_id = a.doc_id"""

  /** Mirror of MultiModal.decodedMulawAudio: the G.711 µ-law pipeline
    * is lossy, but compress∘expand is a PURE INTEGER function —
    * biased-magnitude segment/mantissa quantization then exact
    * reconstruction — so the oracle replays both formulas over the
    * sample formula and the stats hash-gate despite the loss. p2 is
    * 2^exponent as a CASE over the segment boundaries; mantissa =
    * (mag // (8·p2)) % 16; decoded = ±(((mant·8)+132)·p2 − 132).
    * All operands non-negative where divided, so `//` ≡ Spark's
    * integer semantics on the Scala side. */
  val mmAudioMulaw: String = """
WITH a AS (
  SELECT doc_id, doc_id % 50 + 20 AS n, 8000 + (doc_id % 4) * 4000 AS rate
  FROM documents WHERE doc_id % 3 = 1),
s0 AS (
  SELECT a.doc_id, t.i, (a.doc_id * 37 + t.i * 13) % 65536 - 32768 AS raw
  FROM a, UNNEST(range(0, a.n)) t(i)),
m AS (
  SELECT doc_id, i,
         CASE WHEN raw < 0 THEN -1 ELSE 1 END AS sgn,
         LEAST(abs(raw), 32635) + 132 AS mag
  FROM s0),
e AS (
  SELECT doc_id, i, sgn, mag,
         CASE WHEN mag >= 16384 THEN 128 WHEN mag >= 8192 THEN 64
              WHEN mag >= 4096 THEN 32 WHEN mag >= 2048 THEN 16
              WHEN mag >= 1024 THEN 8 WHEN mag >= 512 THEN 4
              WHEN mag >= 256 THEN 2 ELSE 1 END AS p2
  FROM m),
s AS (
  SELECT doc_id, i,
         sgn * ((((mag // (8 * p2)) % 16) * 8 + 132) * p2 - 132) AS v
  FROM e),
st AS (
  SELECT doc_id, COUNT(*) AS n_samples,
         CAST(MAX(abs(v)) AS BIGINT) AS peak_abs,
         CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
         CAST(SUM(v * v) AS BIGINT) AS energy
  FROM s GROUP BY doc_id),
zc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN (v < 0) <> (pv < 0) THEN 1 ELSE 0 END)
              AS BIGINT) AS zero_crossings
  FROM (SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM s)
  GROUP BY doc_id)
SELECT a.doc_id,
       CAST(a.rate AS BIGINT) AS sample_rate,
       st.n_samples,
       CAST(st.n_samples * 1000000 // a.rate AS BIGINT) AS duration_us,
       st.peak_abs, st.sum_abs, st.energy, zc.zero_crossings
FROM a
JOIN st ON st.doc_id = a.doc_id
JOIN zc ON zc.doc_id = a.doc_id"""

  /** Mirror of Layout.eventZValues: Morton interleave of (user_id,
    * minutes since the corpus epoch [[graft.ext.Layout.TimeEpochMicros]]
    * — epoch-relative so the 16-bit time key doesn't wrap), the
    * magic-number spread unrolled as a CTE chain so each step's result
    * is named once (textual substitution would copy the base expression
    * 2^4 times). */
  val layoutZorder: String = s"""
WITH z0 AS (
  SELECT event_id, user_id & 65535 AS va,
         (greatest(0, (epoch_us(ts) - ${graft.ext.Layout.TimeEpochMicros}) // 60000000)) & 65535 AS vb
  FROM events),
z1 AS (SELECT event_id, (va | (va << 8)) & 16711935 AS va,
              (vb | (vb << 8)) & 16711935 AS vb FROM z0),
z2 AS (SELECT event_id, (va | (va << 4)) & 252645135 AS va,
              (vb | (vb << 4)) & 252645135 AS vb FROM z1),
z3 AS (SELECT event_id, (va | (va << 2)) & 858993459 AS va,
              (vb | (vb << 2)) & 858993459 AS vb FROM z2),
z4 AS (SELECT event_id, (va | (va << 1)) & 1431655765 AS va,
              (vb | (vb << 1)) & 1431655765 AS vb FROM z3)
SELECT event_id, CAST(va | (vb << 1) AS BIGINT) AS zval FROM z4"""

  /** Mirror of Layout.skippingStats: the zorder spread chain shared
    * with layoutZorder, both layout assignments unioned, per-(layout,
    * file) min/max stats and the two prune booleans. */
  val layoutSkipping: String = s"""
WITH b0 AS (
  SELECT user_id,
         (greatest(0, (epoch_us(ts) - ${graft.ext.Layout.TimeEpochMicros}) // 60000000)) AS tmin
  FROM events),
rng AS (
  SELECT MIN(user_id) AS u_min, MAX(user_id) AS u_max,
         MIN(tmin) AS t_min, MAX(tmin) AS t_max FROM b0),
z0 AS (
  SELECT user_id, tmin,
         (((user_id - u_min) * 65535) // greatest(u_max - u_min, 1)) & 65535 AS va,
         (((tmin - t_min) * 65535) // greatest(t_max - t_min, 1)) & 65535 AS vb
  FROM b0, rng),
z1 AS (SELECT user_id, tmin, (va | (va << 8)) & 16711935 AS va,
              (vb | (vb << 8)) & 16711935 AS vb FROM z0),
z2 AS (SELECT user_id, tmin, (va | (va << 4)) & 252645135 AS va,
              (vb | (vb << 4)) & 252645135 AS vb FROM z1),
z3 AS (SELECT user_id, tmin, (va | (va << 2)) & 858993459 AS va,
              (vb | (vb << 2)) & 858993459 AS vb FROM z2),
z4 AS (SELECT user_id, tmin, (va | (va << 1)) & 1431655765 AS va,
              (vb | (vb << 1)) & 1431655765 AS vb FROM z3),
zv AS (SELECT user_id, tmin, (va | (vb << 1)) AS zval FROM z4),
assigned AS (
  SELECT 'zorder' AS layout, zval // 67108864 AS file_id, user_id, tmin FROM zv
  UNION ALL
  SELECT 'timesort', tmin // 1024, user_id, tmin FROM zv)
SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       COUNT(*)::BIGINT AS n_rows,
       MIN(user_id) AS min_user, MAX(user_id) AS max_user,
       CAST(MIN(tmin) AS BIGINT) AS min_tmin,
       CAST(MAX(tmin) AS BIGINT) AS max_tmin,
       (MAX(user_id) < 40 OR MIN(user_id) > 80) AS skip_user,
       (MAX(tmin) < 14400 OR MIN(tmin) > 15840) AS skip_time
FROM assigned GROUP BY layout, file_id"""

  /** Mirror of Sketches.kmvDistinct(k=64): k smallest distinct 60-bit
    * md5 values, estimate (k−1)·2⁶⁰/v_k — one double multiply + one
    * divide, fixed order, so the approx-distinct value itself
    * hash-gates (unlike HLL register bytes). */
  val sketchKmv: String = """
WITH hv AS (
  SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
  FROM documents WHERE text IS NOT NULL),
mins AS (SELECT hv FROM hv ORDER BY hv LIMIT 64),
agg AS (SELECT COUNT(*) AS k, MAX(hv) AS vk FROM mins),
ex AS (SELECT COUNT(DISTINCT text) AS n_distinct_exact FROM documents)
SELECT a.k, a.vk,
       CASE WHEN a.k < 64 THEN CAST(a.k AS DOUBLE)
            ELSE CAST(a.k - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                   / a.vk END
         AS n_distinct_est,
       ex.n_distinct_exact
FROM agg a, ex"""

  /** Mirror of Sketches.quantileSketch(k=256): bottom-256 rows per
    * type by the 60-bit md5 hash of the event_id string (event_id
    * tie-break), percentile_disc rank rule (value at row ⌈p·m⌉, value
    * order with event_id ties) over the sample; exact quantiles with
    * the same rank rule over the full data as the eval columns. All
    * picked values are raw parquet doubles — the whole row hash-gates. */
  val sketchQuantiles: String = """
WITH s AS (
  SELECT event_type, event_id, value,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
samp AS (
  SELECT event_type, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY hv, event_id) AS srn
    FROM s)
  WHERE srn <= 256),
est AS (
  SELECT event_type, max(m) AS sample_k,
         max(CASE WHEN rn = CAST(ceil(m * 0.5) AS BIGINT) THEN value END) AS p50_est,
         max(CASE WHEN rn = CAST(ceil(m * 0.9) AS BIGINT) THEN value END) AS p90_est,
         max(CASE WHEN rn = CAST(ceil(m * 0.99) AS BIGINT) THEN value END) AS p99_est
  FROM (SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS m
        FROM samp)
  GROUP BY event_type),
ex AS (
  SELECT event_type, max(n) AS n_exact,
         max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50_exact,
         max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90_exact,
         max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN value END) AS p99_exact
  FROM (SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL)
  GROUP BY event_type)
SELECT est.event_type, est.sample_k, est.p50_est, est.p90_est, est.p99_est,
       ex.n_exact, ex.p50_exact, ex.p90_exact, ex.p99_exact
FROM est JOIN ex ON est.event_type = ex.event_type"""

  /** Mirror of Sketches.countMinTypes(depth=4, width=1024): counter
    * build and point query share the md5 position formula; estimate =
    * min across the 4 rows. */
  val sketchCountMin: String = """
WITH entries AS (
  SELECT event_type, t.j,
         ('0x' || substr(md5(CAST(t.j AS VARCHAR) || ':' || event_type),
            1, 15))::BIGINT % 1024 AS pos
  FROM events, UNNEST(range(0, 4)) t(j)),
counters AS (SELECT j, pos, COUNT(*) AS cnt FROM entries GROUP BY j, pos),
types AS (SELECT event_type, COUNT(*) AS n_exact FROM events GROUP BY event_type),
tk AS (
  SELECT ty.event_type, ty.n_exact, t.j,
         ('0x' || substr(md5(CAST(t.j AS VARCHAR) || ':' || ty.event_type),
            1, 15))::BIGINT % 1024 AS pos
  FROM types ty, UNNEST(range(0, 4)) t(j))
SELECT tk.event_type, tk.n_exact, CAST(MIN(c.cnt) AS BIGINT) AS cms_est
FROM tk JOIN counters c ON c.j = tk.j AND c.pos = tk.pos
GROUP BY tk.event_type, tk.n_exact"""

  /** Mirror of Sketches.hllDistinct (b=4, m=16): bucket = top 4 bits
    * of the 60-bit md5 hash, rank = 57 − bitlength of the low-56-bit
    * field (bin renders without leading zeros in both engines), the
    * harmonic denominator kept as the exact integer Σ 2^(57−M_j), and
    * the estimate one double divide by the shared α₁₆·m²·2⁵⁷ literal.
    * The ln-bearing linear-counting branch is dormant at gated SFs
    * (raw_est = 135/1481 at sf0.01/0.1, z_empty = 0). */
  val sketchHll: String = """
WITH hv AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL),
rw AS (
  SELECT event_type, hv >> 56 AS bucket,
         CASE WHEN (hv & 72057594037927935) = 0 THEN 57
              ELSE 57 - length(bin(hv & 72057594037927935)) END AS rank
  FROM hv),
regs AS (SELECT event_type, bucket, MAX(rank) AS mreg
         FROM rw GROUP BY event_type, bucket),
agg AS (
  SELECT event_type, COUNT(*) AS n_obs,
         CAST(SUM(1::BIGINT << (57 - mreg)) AS BIGINT) AS s_obs
  FROM regs GROUP BY event_type),
est AS (
  SELECT event_type,
         CAST(16 - n_obs AS BIGINT) AS z_empty,
         CAST(s_obs + (16 - n_obs) * (1::BIGINT << 57) AS BIGINT) AS s_scaled
  FROM agg),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_exact
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
SELECT est.event_type, est.z_empty, est.s_scaled,
       CAST(2.482931752321306e19 AS DOUBLE) / est.s_scaled AS raw_est,
       CASE WHEN CAST(2.482931752321306e19 AS DOUBLE) / est.s_scaled <= 40.0
                 AND est.z_empty > 0
            THEN 16.0 * ln(16.0 / est.z_empty)
            ELSE CAST(2.482931752321306e19 AS DOUBLE) / est.s_scaled END
         AS hll_est,
       ex.n_distinct_exact
FROM est JOIN ex ON est.event_type = ex.event_type"""

  // ----------------------------------------------------------- embeddings

  private val quantCte: String = """
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings)"""

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"

  private def norm2Sql(a: String): String =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i]))"

  private def cosineSql(a: String, b: String): String =
    s"CAST(${dotSql(a, b)} AS DOUBLE) / sqrt(CAST(${norm2Sql(a)} * ${norm2Sql(b)} AS DOUBLE))"

  val embedTopK: String = quantCte + s""",
qs AS (SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id % 97 = 0),
scored AS (
  SELECT qs.query_id, q.vec_id, ${cosineSql("qs.qq", "q.qv")} AS cosine
  FROM q, qs WHERE q.vec_id <> qs.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, rank, vec_id AS neighbor_id, cosine FROM ranked WHERE rank <= 5"""

  /** Mirror of the knn_join TVF query: embedTopK without the
    * self-exclusion (the generic join keeps self-matches — each query
    * row ranks itself first at cosine 1.0). */
  private def sqlKnnWhere(qWhere: String): String = quantCte + s""",
qs AS (SELECT vec_id AS query_id, qv AS qq FROM q WHERE $qWhere),
scored AS (
  SELECT qs.query_id, q.vec_id, ${cosineSql("qs.qq", "q.qv")} AS cosine
  FROM q, qs),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, rank, vec_id AS neighbor_id, cosine FROM ranked WHERE rank <= 5"""

  val sqlKnn: String = sqlKnnWhere("vec_id % 97 = 0")

  /** The SERVING-CONTRACT spelling: a FIXED query set (the vec_id <
    * 2000 ceiling covers every gate corpus whole — a no-op there —
    * and pins |Q| to the 1× replica on ScaleGen ladder rungs). */
  val sqlKnnServing: String =
    sqlKnnWhere("vec_id % 97 = 0 AND vec_id < 2000")

  /** Mirror of EmbedOps.mipsTopK: pure integer quantized dot product,
    * rank by (dot DESC, vec_id) — no float anywhere. */
  val embedMipsTopk: String = quantCte + """,
qs AS (SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id % 97 = 0),
scored AS (
  SELECT qs.query_id, q.vec_id,
         CAST(list_sum(list_transform(range(1, 65),
                i -> qs.qq[i] * q.qv[i])) AS BIGINT) AS dot
  FROM q, qs WHERE q.vec_id <> qs.query_id),
ranked AS (
  SELECT query_id, vec_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, rank, vec_id AS neighbor_id, dot FROM ranked WHERE rank <= 5"""

  /** Mirror of EmbedOps.bruteForceTopKNative — the RAW-float path,
    * reproduced bit-for-bit: the native expression computes each term
    * as a FLOAT multiply (Java float·float rounds to float before the
    * widening add) and accumulates left-to-right in a DOUBLE, which is
    * exactly `list_reduce` over `CAST(a[i]*b[i] AS DOUBLE)` terms
    * (DuckDB FLOAT·FLOAT is a float multiply; list_reduce is an
    * ordered left fold — the one float-sum shape that IS cross-engine
    * deterministic). The final dot/sqrt(nx·ny) is three correctly-
    * rounded IEEE ops, so the doubles — and with them the rank order —
    * hash-match. */
  val embedTopKNative: String = {
    def fdot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, 65), " +
        s"i -> CAST($a[i] * $b[i] AS DOUBLE)), (x, y) -> x + y)"
    s"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
qs AS (SELECT vec_id AS query_id, embedding AS qe FROM e WHERE vec_id % 97 = 0),
scored AS (
  SELECT qs.query_id, e.vec_id,
         ${fdot("qs.qe", "e.embedding")}
           / sqrt(${fdot("qs.qe", "qs.qe")} * ${fdot("e.embedding", "e.embedding")})
           AS cosine
  FROM e, qs WHERE e.vec_id <> qs.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, rank, vec_id AS neighbor_id, cosine FROM ranked WHERE rank <= 5"""
  }

  /** Mirror of EmbedOps.prefixRerankTopK(prefixDims=16, candidates=20,
    * k=5): coarse rank by 16-dim-prefix cosine, keep 20 per query,
    * re-rank those by full 64-dim cosine, emit top 5. */
  val embedPrefixRerank: String = {
    def dotN(a: String, b: String, n: Int) =
      s"list_sum(list_transform(range(1, ${n + 1}), i -> $a[i] * $b[i]))"
    def cosN(a: String, b: String, n: Int) =
      s"CAST(${dotN(a, b, n)} AS DOUBLE) / " +
        s"sqrt(CAST(${dotN(a, a, n)} * ${dotN(b, b, n)} AS DOUBLE))"
    quantCte + s""",
qs AS (SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id % 97 = 0),
pre AS (
  SELECT qs.query_id, q.vec_id, q.qv, qs.qq,
         ${cosN("qs.qq", "q.qv", 16)} AS pcos
  FROM q, qs WHERE q.vec_id <> qs.query_id),
cand AS (
  SELECT query_id, vec_id, qv, qq FROM (
    SELECT query_id, vec_id, qv, qq,
           row_number() OVER (PARTITION BY query_id
             ORDER BY pcos DESC, vec_id) AS prank
    FROM pre)
  WHERE prank <= 20),
rescored AS (
  SELECT query_id, vec_id, ${cosineSql("qq", "qv")} AS cosine FROM cand)
SELECT query_id, rank, vec_id AS neighbor_id, cosine FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id) AS rank
  FROM rescored)
WHERE rank <= 5"""
  }

  /** Hyperplane-signature CTEs (dots → sig), shared by the LSH pair
    * and cluster oracles. */
  // signature width mirrors EmbedOps.adaptivePlanes: ceil(log2 n) + 2
  // clamped to [12, 24], computed from the same corpus the signatures
  // index — both engines derive the width from COUNT(*), so they agree
  // at every scale factor, not just the verified one. Plane weights
  // mirror EmbedOps.lshSignature: ±1 from the top bit of md5(64j + i)
  // (first hex digit < '8'), built once in their own CTE.
  private val lshSigCtes: String = """,
nb AS (
  SELECT GREATEST(12, LEAST(24, CAST(CEIL(LOG2(COUNT(*))) AS INT) + 2))
           AS planes
  FROM embeddings),
w AS (
  SELECT j, list_transform(range(0, 64), i ->
           CASE WHEN substr(md5(CAST(j * 64 + i AS VARCHAR)), 1, 1)
                     IN ('0','1','2','3','4','5','6','7')
                THEN 1 ELSE -1 END) AS wts
  FROM (SELECT UNNEST(range(0, nb.planes)) AS j FROM nb)),
dots AS (
  SELECT vec_id, j, list_dot_product(qv, w.wts) AS dotj
  FROM q, w),
sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END)
              AS BIGINT) AS sig
  FROM dots GROUP BY vec_id)"""

  val embedLshNearDups: String = quantCte + lshSigCtes + s""",
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.sig
  FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id)
SELECT p.vec_a, p.vec_b, p.sig, ${cosineSql("qa.qv", "qb.qv")} AS cosine
FROM pairs p
JOIN q qa ON qa.vec_id = p.vec_a
JOIN q qb ON qb.vec_id = p.vec_b"""

  /** Mirror of EmbedOps.nearDupClusters: recursive transitive closure
    * over the LSH pairs verifying at cosine ≥ the default threshold
    * ([[graft.GraftConf.DefaultCosineThreshold]], interpolated — the
    * session conf knob is incompatible with oracle-gated runs, see that
    * constant's doc), component id = min reachable vec_id, singletons
    * via the embeddings left join. */
  val embedClusters: String =
    quantCte.replaceFirst("WITH q", "WITH RECURSIVE q") + lshSigCtes + s""",
vpairs AS (
  SELECT p.vec_a, p.vec_b
  FROM (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM sig a JOIN sig b ON a.sig = b.sig AND a.vec_id < b.vec_id) p
  JOIN q qa ON qa.vec_id = p.vec_a
  JOIN q qb ON qb.vec_id = p.vec_b
  WHERE ${cosineSql("qa.qv", "qb.qv")} >= ${graft.GraftConf.DefaultCosineThreshold}),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM vpairs
  UNION ALL SELECT vec_b, vec_a FROM vpairs),
reach AS (
  SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
comp AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src),
lab AS (
  SELECT v.vec_id, COALESCE(c.cluster_id, v.vec_id) AS cluster_id
  FROM embeddings v LEFT JOIN comp c ON c.vec_id = v.vec_id)
SELECT vec_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       vec_id = cluster_id AS is_canonical
FROM lab"""

  val embedNearDupExact: String = quantCte + s"""
SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       ${cosineSql("a.qv", "b.qv")} AS cosine
FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ${cosineSql("a.qv", "b.qv")} >= ${graft.GraftConf.DefaultCosineThreshold}"""

  /** Mirror of EmbedOps.topKNearDups: the bounded-output near-dup form
    * — same blocked pair join as embedNearDupExact, ranked per label
    * with deterministic (vec_a, vec_b) ties, top 5 kept. */
  val embedNearDupTopk: String = quantCte + s"""
SELECT label, CAST(rank AS INT) AS rank, vec_a, vec_b, cosine FROM (
  SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         ${cosineSql("a.qv", "b.qv")} AS cosine,
         row_number() OVER (PARTITION BY a.label
           ORDER BY ${cosineSql("a.qv", "b.qv")} DESC, a.vec_id, b.vec_id)
           AS rank
  FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id)
WHERE rank <= 5"""

  /** Mirror of Corpus.crossSignalNearDups: full outer join of the two
    * verified pair sets (each nested with its own CTE chain — DuckDB
    * accepts WITH inside derived tables), flags coalesced to false. */
  def corpusCrossSignal: String = s"""
SELECT COALESCE(l.doc_a, s.vec_a) AS doc_a,
       COALESCE(l.doc_b, s.vec_b) AS doc_b,
       l.doc_a IS NOT NULL AS lexical,
       s.vec_a IS NOT NULL AS semantic
FROM ($dedupMinhash) l
FULL JOIN (SELECT vec_a, vec_b FROM ($embedLshNearDups) WHERE cosine >= ${graft.GraftConf.DefaultCosineThreshold}) s
  ON s.vec_a = l.doc_a AND s.vec_b = l.doc_b"""

  /** Assignment CTE body: nearest of the centroids in `cents` for every
    * vector of `src` (the full corpus by default; the bounded training
    * sample for the sampled-fit mirror), integer squared L2, ties to
    * the lowest centroid id. */
  private def kmeansAssignSql(cents: String, src: String = "q"): String = s"""
  SELECT vec_id, centroid_id, d2 FROM (
    SELECT vec_id, centroid_id, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
    FROM (SELECT q.vec_id, c.centroid_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS BIGINT) AS d2
          FROM $src q, $cents c))
  WHERE rn = 1"""

  /** Lloyd update CTEs: per-(centroid, dim) integer sums from the
    * assignment `a` over the vectors of `src`, floor division
    * (s − ((s%n)+n)%n)/n — exact, the dividend is made divisible —
    * and COALESCE keeps the previous centroid for emptied clusters. */
  private def kmeansUpdateSql(a: String, prev: String, out: String,
      src: String = "q"): String = s"""
s_$out AS (
  SELECT a.centroid_id, t.i, SUM(q.qv[t.i]) AS s, COUNT(*) AS n
  FROM $a a JOIN $src q ON q.vec_id = a.vec_id, UNNEST(range(1, 65)) t(i)
  GROUP BY a.centroid_id, t.i),
p_$out AS (
  SELECT centroid_id,
         list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY i) AS cv
  FROM s_$out GROUP BY centroid_id),
$out AS (
  SELECT c.centroid_id, COALESCE(p.cv, c.cv) AS cv
  FROM $prev c LEFT JOIN p_$out p USING (centroid_id))"""

  /** Mirror of EmbedOps.kmeansAssignments(k=8, iters=2): seeds = the 8
    * lowest vec_ids in the HASH-SPREAD order (EmbedOps.seedSpread —
    * Knuth multiplicative hash + one xor-fold, ties on vec_id), two
    * Lloyd rounds, output = the final assignment. Every value is a
    * 64-bit integer — no float enters the plan. */
  private def kmeansCtes: String = quantCte + s""",
c0 AS (SELECT vec_id AS centroid_id, qv AS cv FROM (
  SELECT vec_id, qv,
         ((vec_id % 4194304 + 99991) * 2654435761) % 4294967296 AS h
  FROM q) ORDER BY xor(h, h // 65536), vec_id LIMIT 8),
a0 AS (${kmeansAssignSql("c0")}),${kmeansUpdateSql("a0", "c0", "c1")},
a1 AS (${kmeansAssignSql("c1")}),${kmeansUpdateSql("a1", "c1", "c2")}"""

  val embedKmeans: String = kmeansCtes + "\n" + kmeansAssignSql("c2")

  /** Mirror of EmbedOps.assignAgainst over
    * kmeansCentroidsSampled(sampleCap=256, k=8, iters=2): the fit —
    * seeds AND both Lloyd rounds — sees only the 256-row key-pure
    * md5-ordered sample (`qs`); the final assignment covers the FULL
    * corpus. Every value 64-bit integer. */
  val embedKmeansSampled: String = quantCte + s""",
qs AS (SELECT vec_id, qv FROM q
       ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                vec_id
       LIMIT 256),
c0 AS (SELECT vec_id AS centroid_id, qv AS cv FROM (
  SELECT vec_id, qv,
         ((vec_id % 4194304 + 99991) * 2654435761) % 4294967296 AS h
  FROM qs) ORDER BY xor(h, h // 65536), vec_id LIMIT 8),
a0 AS (${kmeansAssignSql("c0", "qs")}),${kmeansUpdateSql("a0", "c0", "c1", "qs")},
a1 AS (${kmeansAssignSql("c1", "qs")}),${kmeansUpdateSql("a1", "c1", "c2", "qs")}
""" + kmeansAssignSql("c2")

  /** Mirror of EmbedOps.balancedSample(k=8, iters=2, perCluster=20):
    * the final k-means assignment, then per-cluster row_number in the
    * key-pure md5 order (same hash idiom as [[textHashSample]]), capped at
    * 20 per centroid. */
  val embedBalancedSample: String = kmeansCtes + s""",
a2 AS (${kmeansAssignSql("c2")})
SELECT centroid_id, vec_id, d2, rk FROM (
  SELECT centroid_id, vec_id, d2,
         row_number() OVER (PARTITION BY centroid_id
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id) AS rk
  FROM a2)
WHERE rk <= 20"""

  /** Shared CTE chain for the semDedup keep-rule variants: the full
    * k-means fit, within-centroid quantized-cosine pairs at the
    * default threshold, recursive-CTE connected components (min-id
    * group), singleton restore — everything up to the keep rank. */
  private def semdedupLabCtes: String =
    kmeansCtes.replaceFirst("WITH q", "WITH RECURSIVE q") + s""",
a2 AS (${kmeansAssignSql("c2")}),
sp AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM a2 a
  JOIN a2 b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  JOIN q qa ON qa.vec_id = a.vec_id
  JOIN q qb ON qb.vec_id = b.vec_id
  WHERE ${cosineSql("qa.qv", "qb.qv")} >= ${graft.GraftConf.DefaultCosineThreshold}),
edges AS (SELECT va AS a, vb AS b FROM sp UNION ALL SELECT vb, va FROM sp),
reach AS (
  SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
comp AS (SELECT src AS vec_id, min(dst) AS group_id FROM reach GROUP BY src),
lab AS (
  SELECT a.vec_id, a.centroid_id, a.d2,
         COALESCE(c.group_id, a.vec_id) AS group_id
  FROM a2 a LEFT JOIN comp c ON c.vec_id = a.vec_id)"""

  /** Mirror of EmbedOps.semDedupFrom over the shared k-means chain:
    * keep = the group member farthest from its centroid (d2 DESC,
    * vec_id). */
  val embedSemdedup: String = semdedupLabCtes + """
SELECT vec_id, centroid_id, group_id,
       (count(*) OVER (PARTITION BY group_id))::BIGINT AS group_size,
       row_number() OVER (PARTITION BY group_id ORDER BY d2 DESC, vec_id) = 1
         AS keep
FROM lab"""

  /** Mirror of EmbedOps.semDedupByCosineFrom: same groups, keep = the
    * member with the LOWEST quantized cosine to its own centroid (the
    * paper's literal rule for varying-norm regimes). */
  val embedSemdedupCosine: String = semdedupLabCtes + s""",
labc AS (
  SELECT l.vec_id, l.centroid_id, l.group_id,
         ${cosineSql("q.qv", "c.cv")} AS centroid_cosine
  FROM lab l JOIN q ON q.vec_id = l.vec_id
             JOIN c2 c ON c.centroid_id = l.centroid_id)
SELECT vec_id, centroid_id, group_id,
       (count(*) OVER (PARTITION BY group_id))::BIGINT AS group_size,
       centroid_cosine,
       row_number() OVER (PARTITION BY group_id
         ORDER BY centroid_cosine ASC, vec_id) = 1 AS keep
FROM labc"""

  /** 16-dim integer squared L2 between two subvector lists. */
  private def pqD2Sql(s: String, c: String): String =
    s"CAST(list_sum(list_transform(range(1, 17), i -> ($s[i] - $c[i]) * ($s[i] - $c[i]))) AS BIGINT)"

  /** Nearest-centroid-per-(vector, subspace) CTE body: assign `src`'s
    * subvectors against codebook `cents`. */
  private def pqAssignSql(cents: String, src: String = "subs"): String = s"""
  SELECT vec_id, sub, centroid_id FROM (
    SELECT vec_id, sub, centroid_id,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, centroid_id) AS rn
    FROM (SELECT s.vec_id, s.sub, c.centroid_id, ${pqD2Sql("s.sq", "c.cv")} AS d2
          FROM $src s JOIN $cents c ON c.sub = s.sub))
  WHERE rn = 1"""

  /** Shared PQ codebook CTEs: slice into 4 subspaces, one Lloyd round
    * per subspace TRAINED on the rows satisfying `trainPred` (TRUE =
    * whole corpus), then encode the WHOLE corpus against the resulting
    * codebook (`codes`) — the frozen-codebook contract of the
    * persisted incremental index, degenerate when trainPred is TRUE. */
  private def pqTrainCtesWhere(trainPred: String): String = s""",
subs AS (
  SELECT vec_id, label, t.sub, list_slice(qv, t.sub * 16 + 1, t.sub * 16 + 16) AS sq
  FROM q, UNNEST(range(0, 4)) t(sub)),
tsubs AS (SELECT * FROM subs WHERE $trainPred),
seeds AS (
  SELECT s.sub, s.vec_id AS centroid_id, s.sq AS cv
  FROM tsubs s WHERE s.vec_id IN (
    SELECT vec_id FROM q WHERE $trainPred ORDER BY vec_id LIMIT 8)),
a0 AS (${pqAssignSql("seeds", "tsubs")}),
s_c1 AS (
  SELECT a.sub, a.centroid_id, t.i, SUM(s.sq[t.i]) AS s, COUNT(*) AS n
  FROM a0 a JOIN tsubs s ON s.vec_id = a.vec_id AND s.sub = a.sub,
       UNNEST(range(1, 17)) t(i)
  GROUP BY a.sub, a.centroid_id, t.i),
p_c1 AS (
  SELECT sub, centroid_id,
         list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY i) AS cv
  FROM s_c1 GROUP BY sub, centroid_id),
c1 AS (
  SELECT c.sub, c.centroid_id, COALESCE(p.cv, c.cv) AS cv
  FROM seeds c LEFT JOIN p_c1 p ON p.sub = c.sub AND p.centroid_id = c.centroid_id),
codes AS (${pqAssignSql("c1")})"""

  private def pqTrainCtes: String = pqTrainCtesWhere("TRUE")

  /** Mirror of EmbedOps.pqTopK(m=4, dsub=16, ksub=8, k=5): shared
    * codebook train/encode, then asymmetric-distance top-5 — every
    * value 64-bit integer. */
  val embedPqTopK: String = quantCte + pqTrainCtes + s""",
dt AS (
  SELECT s.vec_id AS query_id, s.sub, c.centroid_id, ${pqD2Sql("s.sq", "c.cv")} AS dt
  FROM subs s JOIN c1 c ON c.sub = s.sub
  WHERE s.vec_id % 97 = 0),
ad AS (
  SELECT d.query_id, co.vec_id, CAST(SUM(d.dt) AS BIGINT) AS adist
  FROM codes co JOIN dt d ON d.sub = co.sub AND d.centroid_id = co.centroid_id
  WHERE co.vec_id <> d.query_id
  GROUP BY d.query_id, co.vec_id)
SELECT query_id, rank, vec_id AS neighbor_id, adist FROM (
  SELECT query_id, vec_id, adist,
         row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
  FROM ad)
WHERE rank <= 5"""

  /** Mirror of EmbedOps.scalarQuantize8: per-vector integer scale,
    * symmetric round-half-away codes (non-negative div operands only —
    * DuckDB `//` floors where Spark `div` truncates; they agree only
    * above zero), exact integer reconstruction error. */
  val embedSq8: String = quantCte + """,
sq AS (
  SELECT vec_id, qv,
         greatest(1, (list_max(list_transform(qv, x -> abs(x))) + 126) // 127) AS scale
  FROM q),
c AS (
  SELECT vec_id, scale,
         CAST(list_sum(list_transform(range(1, 65), i ->
           (qv[i] - ((CASE WHEN qv[i] < 0 THEN -1 ELSE 1 END)
                     * ((abs(qv[i]) + scale // 2) // scale)) * scale)
           * (qv[i] - ((CASE WHEN qv[i] < 0 THEN -1 ELSE 1 END)
                     * ((abs(qv[i]) + scale // 2) // scale)) * scale)))
           AS BIGINT) AS err2,
         CAST(list_max(list_transform(qv, x -> (abs(x) + scale // 2) // scale))
           AS BIGINT) AS max_code
  FROM sq)
SELECT vec_id, CAST(scale AS BIGINT) AS scale, max_code, err2,
       CAST(err2 AS DOUBLE) / 64 AS mse_per_dim
FROM c"""

  /** Mirror of EmbedOps.normProfile: per-label counts, dim-consistency
    * min/max, and the exact quantized squared-norm distribution. */
  val embedNormProfile: String = quantCte + """,
n AS (
  SELECT q.label, CAST(len(e.embedding) AS INT) AS dims,
         CAST(list_sum(list_transform(q.qv, x -> x * x)) AS BIGINT) AS n2
  FROM q JOIN embeddings e USING (vec_id))
SELECT label, COUNT(*) AS n_vecs,
       MIN(dims) AS min_dims, MAX(dims) AS max_dims,
       CAST(MIN(n2) AS BIGINT) AS min_norm2,
       CAST(MAX(n2) AS BIGINT) AS max_norm2,
       CAST(SUM(n2) AS BIGINT) AS sum_norm2,
       CAST(SUM(n2) AS DOUBLE) / COUNT(*) AS mean_norm2
FROM n GROUP BY label"""

  /** 64-dim integer squared L2 between a query vector and a coarse
    * centroid list. */
  private def coarseD2Sql(a: String, c: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $c[i]) * ($a[i] - $c[i]))) AS BIGINT)"

  /** Mirror of EmbedOps.ivfPqTopK at a given nprobe: same shared
    * codebook + codes; coarse centroids are per-label integer
    * floor-means, each query probes its `nprobe` nearest lists, and
    * the ADC join carries the probed label as a third equi key. */
  def embedIvfPqTopKAt(nprobe: Int): String =
    quantCte + pqTrainCtes + ivfPqSearchTail(nprobe)

  /** [[embedIvfPqTopK]] restricted to the SERVING-CONTRACT fixed
    * query set (vec_id < 2000 — a no-op on the gate corpora, a fixed
    * |Q| on ScaleGen ladder rungs). */
  val embedIvfPqTopKServing: String =
    quantCte + pqTrainCtes + ivfPqSearchTail(2, servingCeil = Some(2000L))

  /** The IVF-PQ search tail shared by the in-session and persisted-
    * index oracles: coarse floor-mean centroids over the FULL corpus,
    * nprobe nearest lists per query, ADC inside probed lists, top-5. */
  private def ivfPqSearchTail(nprobe: Int,
      servingCeil: Option[Long] = None): String = s""",
coarse AS (
  SELECT label, list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY i) AS ccv
  FROM (SELECT label, t.i, SUM(qv[t.i]) AS s, COUNT(*) AS n
        FROM q, UNNEST(range(1, 65)) t(i)
        GROUP BY label, t.i)
  GROUP BY label),
probes AS (
  SELECT query_id, label AS plabel FROM (
    SELECT qq.vec_id AS query_id, c.label,
           row_number() OVER (PARTITION BY qq.vec_id
             ORDER BY ${coarseD2Sql("qq.qv", "c.ccv")}, c.label) AS pr
    FROM q qq CROSS JOIN coarse c
    WHERE qq.vec_id % 97 = 0${servingCeil.map(c => s" AND qq.vec_id < $c").getOrElse("")})
  WHERE pr <= $nprobe),
dt AS (
  SELECT s.vec_id AS query_id, s.sub, c.centroid_id,
         ${pqD2Sql("s.sq", "c.cv")} AS dt
  FROM subs s JOIN c1 c ON c.sub = s.sub
  WHERE s.vec_id % 97 = 0${servingCeil.map(c => s" AND s.vec_id < $c").getOrElse("")}),
ad AS (
  SELECT d.query_id, ql.label, co.vec_id, CAST(SUM(d.dt) AS BIGINT) AS adist
  FROM codes co
  JOIN q ql ON ql.vec_id = co.vec_id
  JOIN probes p ON p.plabel = ql.label
  JOIN dt d ON d.sub = co.sub AND d.centroid_id = co.centroid_id
            AND d.query_id = p.query_id
  WHERE co.vec_id <> d.query_id
  GROUP BY d.query_id, ql.label, co.vec_id)
SELECT query_id, label, rank, vec_id AS neighbor_id, adist FROM (
  SELECT query_id, label, vec_id, adist,
         row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank
  FROM ad)
WHERE rank <= 5"""

  val embedIvfPqTopK: String = embedIvfPqTopKAt(2)

  /** Mirror of the persisted index's INCREMENTAL path
    * (EmbedIndex.build on vec_id % 5 <> 0, then append of the rest):
    * codebooks trained on the base segment only and FROZEN, the whole
    * corpus encoded against them, coarse centroids over base+delta
    * (the index's exact integer sums-merge equals this full
    * recompute), same multi-probe ADC search. */
  val embedIvfPqIncremental: String =
    quantCte + pqTrainCtesWhere("vec_id % 5 <> 0") + ivfPqSearchTail(2)

  /** Mirror of EmbedOps.ivfPqRecallCompare(k=5): exact global top-5 vs
    * the IVF-PQ search at nprobe 1 and 2 — final-top-k hits per query
    * on the (query, neighbor) pair key, plus probe coverage (exact
    * neighbors whose list is within the first 1 / 2 probes of the
    * shared coarse ranking). */
  val embedIvfPqRecall: String = quantCte + s""",
coarse AS (
  SELECT label, list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY i) AS ccv
  FROM (SELECT label, t.i, SUM(qv[t.i]) AS s, COUNT(*) AS n
        FROM q, UNNEST(range(1, 65)) t(i)
        GROUP BY label, t.i)
  GROUP BY label),
probesAll AS (
  SELECT qq.vec_id AS query_id, c.label AS plabel,
         row_number() OVER (PARTITION BY qq.vec_id
           ORDER BY ${coarseD2Sql("qq.qv", "c.ccv")}, c.label) AS pr
  FROM q qq CROSS JOIN coarse c
  WHERE qq.vec_id % 97 = 0),
exact AS (
  SELECT query_id, neighbor_id FROM ($embedTopK)),
p1 AS (
  SELECT query_id, neighbor_id FROM (${embedIvfPqTopKAt(1)})),
p2 AS (
  SELECT query_id, neighbor_id FROM (${embedIvfPqTopKAt(2)})),
h1 AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM exact e JOIN p1 ON p1.query_id = e.query_id AND p1.neighbor_id = e.neighbor_id
  GROUP BY e.query_id),
h2 AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM exact e JOIN p2 ON p2.query_id = e.query_id AND p2.neighbor_id = e.neighbor_id
  GROUP BY e.query_id),
cov1 AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM exact e
  JOIN q nl ON nl.vec_id = e.neighbor_id
  JOIN probesAll p ON p.query_id = e.query_id AND p.plabel = nl.label AND p.pr <= 1
  GROUP BY e.query_id),
cov2 AS (
  SELECT e.query_id, COUNT(*) AS n
  FROM exact e
  JOIN q nl ON nl.vec_id = e.neighbor_id
  JOIN probesAll p ON p.query_id = e.query_id AND p.plabel = nl.label AND p.pr <= 2
  GROUP BY e.query_id)
SELECT qy.query_id,
       COALESCE(h1.n, 0) AS hits_nprobe1,
       COALESCE(h2.n, 0) AS hits_nprobe2,
       COALESCE(cov1.n, 0) AS covered_nprobe1,
       COALESCE(cov2.n, 0) AS covered_nprobe2,
       CAST(COALESCE(h1.n, 0) AS DOUBLE) / 5 AS recall_nprobe1,
       CAST(COALESCE(h2.n, 0) AS DOUBLE) / 5 AS recall_nprobe2
FROM (SELECT DISTINCT query_id FROM exact) qy
LEFT JOIN h1 ON h1.query_id = qy.query_id
LEFT JOIN h2 ON h2.query_id = qy.query_id
LEFT JOIN cov1 ON cov1.query_id = qy.query_id
LEFT JOIN cov2 ON cov2.query_id = qy.query_id"""

  /** Mirror of EmbedOps.pqRecall(k=5): both searches nested as derived
    * tables (each with its own CTE chain), hits counted on the (query,
    * neighbor) pair key, recall = hits / 5. */
  val embedPqRecall: String = s"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM ($embedTopK)),
pq AS (
  SELECT query_id, neighbor_id FROM ($embedPqTopK)),
hits AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact e JOIN pq p
    ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
  GROUP BY e.query_id)
SELECT q.query_id,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 5 AS recall
FROM (SELECT DISTINCT query_id FROM exact) q
LEFT JOIN hits h ON h.query_id = q.query_id"""

  /** Mirror of TextOps.paragraphDedup (w=8): fixed-width 8-token
    * segments, corpus-wide first-occurrence survivor by (doc_id, pos);
    * ROW_NUMBER replicates Spark's min(struct(doc_id, pos)) canonical
    * pick. */
  val textParagraphDedup: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
segs AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(t[(i-1)*8+1:(i-1)*8+8], ' ')) AS seg_md5
  FROM toks, UNNEST(range(1, greatest((n + 7) // 8, 1) + 1)) u(i)),
rn AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY seg_md5 ORDER BY doc_id, pos) AS r
  FROM segs)
SELECT doc_id,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN r = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN r = 1 THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*)
         AS dup_seg_frac
FROM rn GROUP BY doc_id"""

  /** Mirror of TextOps.dupSegments (w=4): within-doc duplicate-segment
    * and duplicate-char fractions over fixed-width 4-token segments. */
  val textDupSegments: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
segs AS (
  SELECT doc_id, array_to_string(t[(i-1)*4+1:(i-1)*4+4], ' ') AS seg
  FROM toks, UNNEST(range(1, greatest((n + 3) // 4, 1) + 1)) u(i)),
gc AS (
  SELECT doc_id, seg, COUNT(*) AS c,
         CAST(length(seg) AS BIGINT) AS len
  FROM segs GROUP BY doc_id, seg)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_segments,
       COUNT(*) AS n_distinct,
       CAST(SUM(c) - COUNT(*) AS DOUBLE) / SUM(c) AS dup_seg_frac,
       CAST(SUM((c - 1) * len) AS DOUBLE) / SUM(c * len) AS dup_char_frac
FROM gc GROUP BY doc_id"""

  /** Mirror of TextOps.dupSpans (w=8): stride-1 8-token windows hashed
    * with md5; a span is duplicated when its window text occurs in ≥ 2
    * distinct docs; token coverage is the distinct positions inside
    * duplicated spans. Positions are 0-based on both sides (u(i) is
    * 1-based, hence i-1). */
  val textDupSpans: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
spans AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS h
  FROM toks, UNNEST(range(1, greatest(n - 7, 0) + 1)) u(i)),
shared AS (
  SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM spans GROUP BY h)
  WHERE ndocs >= 2),
flagged AS (
  SELECT s.doc_id, s.pos, sh.h IS NOT NULL AS dup
  FROM spans s LEFT JOIN shared sh ON s.h = sh.h),
span_agg AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
  FROM flagged GROUP BY doc_id),
covered AS (
  SELECT doc_id, COUNT(DISTINCT tok) AS dup_tokens
  FROM flagged, UNNEST(range(pos, pos + 8)) u(tok)
  WHERE dup GROUP BY doc_id)
SELECT d.doc_id,
       CAST(d.n AS BIGINT) AS n_tokens,
       COALESCE(a.n_spans, 0) AS n_spans,
       COALESCE(a.dup_spans, 0) AS dup_spans,
       COALESCE(c.dup_tokens, 0) AS dup_tokens,
       CASE WHEN COALESCE(a.n_spans, 0) = 0 THEN 0.0
            ELSE CAST(a.dup_spans AS DOUBLE) / a.n_spans END AS dup_span_frac,
       CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / d.n AS dup_token_frac
FROM toks d
LEFT JOIN span_agg a ON d.doc_id = a.doc_id
LEFT JOIN covered c ON d.doc_id = c.doc_id"""

  /** Shared CTE chain for the UNBOUNDED exact-substring dedup mirror
    * (TextOps.maximalDupSpans, w=8, occCap=64): stride-1 window
    * hashes, shared-and-capped hash filter, blocked self-join, then
    * the DIAGONAL island merge — consecutive pos_a runs per
    * (doc_a, doc_b, diag) reconstruct each maximal shared substring.
    * Frames are explicit ROWS (DuckDB's ORDER BY default is RANGE,
    * which treats ties as peers — Spark's rowsBetween does not). */
  private def maximalSpanCtes: String = """
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
occ AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS h
  FROM toks, UNNEST(range(1, greatest(n - 7, 0) + 1)) u(i)),
eligible AS (
  SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS ndocs, COUNT(*) AS nocc
    FROM occ GROUP BY h)
  WHERE ndocs >= 2 AND nocc <= 64),
hits AS (SELECT o.doc_id, o.pos, o.h FROM occ o JOIN eligible e ON o.h = e.h),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         b.pos - a.pos AS diag, a.pos AS pos_a
  FROM hits a JOIN hits b ON a.h = b.h AND a.doc_id < b.doc_id),
isl AS (
  SELECT doc_a, doc_b, diag, pos_a,
         SUM(CASE WHEN pos_a - lag_pos = 1 THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (SELECT m.*, lag(pos_a) OVER (PARTITION BY doc_a, doc_b, diag
          ORDER BY pos_a) AS lag_pos FROM m)),
spans AS (
  SELECT doc_a, doc_b,
         CAST(MIN(pos_a) AS BIGINT) AS start_a,
         CAST(MAX(pos_a) + 7 AS BIGINT) AS end_a,
         CAST(MIN(pos_a) + diag AS BIGINT) AS start_b,
         CAST(MAX(pos_a) + diag + 7 AS BIGINT) AS end_b,
         CAST(MAX(pos_a) - MIN(pos_a) + 8 AS BIGINT) AS span_tokens,
         COUNT(*) AS n_windows
  FROM isl GROUP BY doc_a, doc_b, diag, island)"""

  /** Mirror of TextOps.maximalDupSpans(w=8, occCap=64). */
  val textDupMaximalSpans: String = maximalSpanCtes + """
SELECT doc_a, doc_b, start_a, end_a, start_b, end_b, span_tokens,
       n_windows
FROM spans"""

  /** Mirror of TextOps.dedupExcise(w=8, occCap=64): keep the FIRST
    * occurrence (doc_a side), excise the merged duplicated intervals
    * from every doc_b; rebuilt text via ordered token re-aggregation
    * over the uncovered positions (the corpusDecontamExcise idiom),
    * byte-identical pass-through for untouched docs. */
  val textDedupExcise: String = maximalSpanCtes + """,
bi AS (SELECT doc_b AS doc_id, start_b AS s, end_b AS e FROM spans),
mg AS (
  SELECT doc_id, MIN(s) AS cs, MAX(e) AS ce FROM (
    SELECT doc_id, s, e,
           SUM(CASE WHEN s <= COALESCE(prev_max, -1) + 1 THEN 0 ELSE 1 END)
             OVER (PARTITION BY doc_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM (SELECT doc_id, s, e,
            MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM bi))
  GROUP BY doc_id, island),
ncut AS (SELECT doc_id, COUNT(*) AS n_cuts FROM mg GROUP BY doc_id),
ptok AS (
  SELECT tk.doc_id, u.i AS pos, tk.t[u.i] AS tok
  FROM toks tk JOIN ncut USING (doc_id), UNNEST(range(1, tk.n + 1)) u(i)),
keep AS (
  SELECT p.doc_id, p.pos, p.tok FROM ptok p
  WHERE NOT EXISTS (SELECT 1 FROM mg m WHERE m.doc_id = p.doc_id
                    AND p.pos - 1 BETWEEN m.cs AND m.ce)),
rebuilt AS (
  SELECT nc.doc_id, COALESCE(k.kept, 0) AS kept,
         COALESCE(k.ct, '') AS clean_text
  FROM ncut nc LEFT JOIN (
    SELECT doc_id, COUNT(*) AS kept,
           string_agg(tok, ' ' ORDER BY pos) AS ct
    FROM keep GROUP BY doc_id) k USING (doc_id))
SELECT tk.doc_id, CAST(tk.n AS BIGINT) AS n_tokens,
       CAST(CASE WHEN r.doc_id IS NULL THEN 0 ELSE tk.n - r.kept END
            AS BIGINT) AS n_removed,
       COALESCE(r.clean_text, tk.text) AS clean_text,
       md5(COALESCE(r.clean_text, tk.text)) AS clean_md5
FROM toks tk LEFT JOIN rebuilt r USING (doc_id)"""

  /** Mirror of TextOps.dupSpanAudit(w=8, occCap=64): the measured
    * recall bound — shared hashes seen vs excluded by the cap. */
  val textDupSpanAudit: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
occ AS (
  SELECT doc_id, i - 1 AS pos, md5(array_to_string(t[i:i+7], ' ')) AS h
  FROM toks, UNNEST(range(1, greatest(n - 7, 0) + 1)) u(i)),
byh AS (
  SELECT h, COUNT(DISTINCT doc_id) AS ndocs, COUNT(*) AS nocc
  FROM occ GROUP BY h)
SELECT COUNT(*) AS n_hashes_shared,
       COALESCE(CAST(SUM(CASE WHEN nocc > 64 THEN 1 ELSE 0 END) AS BIGINT),
                0) AS n_hashes_capped,
       COALESCE(CAST(SUM(CASE WHEN nocc > 64 THEN nocc ELSE 0 END) AS BIGINT),
                0) AS n_occ_capped
FROM byh WHERE ndocs >= 2"""

  /** Mirror of TextOps.maximalDupIslands(w=8, occCap=64): both sides'
    * intervals, per-doc running-max interval merge over overlap and
    * token adjacency. */
  val textDupIslands: String = maximalSpanCtes + """,
ivals AS (
  SELECT doc_a AS doc_id, start_a AS s, end_a AS e FROM spans
  UNION ALL
  SELECT doc_b, start_b, end_b FROM spans),
mk AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN s <= COALESCE(prev_max, -1) + 1 THEN 0 ELSE 1 END)
           OVER (PARTITION BY doc_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (SELECT doc_id, s, e,
          MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM ivals))
SELECT doc_id, MIN(s) AS start_tok, MAX(e) AS end_tok,
       MAX(e) - MIN(s) + 1 AS span_tokens, COUNT(*) AS n_sources
FROM mk GROUP BY doc_id, island"""

  /** Mirror of TextOps.qualityModelScore: hashed-bigram buckets
    * (md5-derived, 4096 slots), Knuth-hash pseudo-weights in
    * [-1000, 1000], integer sum, one final mean division. */
  val textQualityModel: String = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents),
grams AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
  FROM toks, UNNEST(range(1, greatest(n - 1, 1) + 1)) u(i)),
w AS (
  SELECT doc_id,
         (('0x' || substr(md5(g), 1, 8))::BIGINT % 4096) * 2654435761
           % 4294967296 % 2001 - 1000 AS wt
  FROM grams)
SELECT doc_id,
       COUNT(*) AS n_features,
       CAST(SUM(wt) AS BIGINT) AS score_sum,
       CAST(SUM(wt) AS DOUBLE) / (COUNT(*) * 1000) AS model_score
FROM w GROUP BY doc_id"""

  val embedIvfTopK: String = quantCte + s""",
qs AS (SELECT vec_id AS query_id, label, qv AS qq FROM q WHERE vec_id % 97 = 0),
scored AS (
  SELECT qs.query_id, q.label, q.vec_id, ${cosineSql("qs.qq", "q.qv")} AS cosine
  FROM q JOIN qs ON q.label = qs.label AND q.vec_id <> qs.query_id),
ranked AS (
  SELECT query_id, label, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, label, rank, vec_id AS neighbor_id, cosine FROM ranked WHERE rank <= 5"""

  /** Mirror of TextOps.bm25TopDocsFrom(query = (dup, spark, data),
    * k = 20): exact-integer rational-idf BM25; `//` floors = Spark
    * `div` truncation because every operand is positive. */
  val textBm25: String = """
WITH tf AS (
  SELECT doc_id, t.term, COUNT(*)::BIGINT AS tf
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       UNNEST(toks) t(term)
  GROUP BY 1, 2),
dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl FROM documents),
tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens, COUNT(*)::BIGINT AS n_docs FROM dl),
qtf AS (SELECT * FROM tf WHERE term IN ('dup', 'spark', 'data')),
dfq AS (SELECT term, COUNT(*)::BIGINT AS df FROM qtf GROUP BY 1),
scored AS (
  SELECT q.doc_id, dl.dl,
         ((1000 * (2 * t.n_docs + 1)) // (2 * f.df + 1))
           * ((1000000 * 44 * t.t_tokens * q.tf)
              // (20 * t.t_tokens * q.tf + 6 * t.t_tokens + 18 * dl.dl * t.n_docs))
           AS term_score
  FROM qtf q JOIN dfq f USING (term) JOIN dl USING (doc_id), tot t)
SELECT doc_id, dl, COUNT(*)::BIGINT AS n_hit,
       CAST(SUM(term_score) AS BIGINT) AS score
FROM scored GROUP BY doc_id, dl
ORDER BY score DESC, doc_id LIMIT 20"""

  /** Mirror of Sketches.kmvShingleOverlap(w = 8, k = 512): KMV
    * sketch-intersection estimators over the doc_id-parity halves.
    * Float columns are fixed-order correctly-rounded divides of exact
    * integers — identical bit patterns cross-engine. Below sketch
    * capacity (ku < 512) est_union is the exact ku, as in the Scala. */
  val sketchKmvOverlap: String = """
WITH sh AS (
  SELECT doc_id % 2 AS half,
         ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15))::BIGINT AS hv
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       UNNEST(range(1, len(toks) - 6)) t(i)
  WHERE len(toks) >= 8),
dist AS (SELECT DISTINCT half, hv FROM sh),
a AS (SELECT hv FROM dist WHERE half = 0 ORDER BY hv LIMIT 512),
b AS (SELECT hv FROM dist WHERE half = 1 ORDER BY hv LIMIT 512),
u AS (SELECT DISTINCT hv FROM (SELECT hv FROM a UNION ALL SELECT hv FROM b)
      ORDER BY hv LIMIT 512),
uagg AS (SELECT COUNT(*)::BIGINT AS ku, MAX(hv) AS theta FROM u),
cagg AS (SELECT COUNT(*)::BIGINT AS c FROM u JOIN a USING (hv) JOIN b USING (hv)),
ex AS (SELECT
  (SELECT COUNT(*) FROM dist WHERE half = 0)::BIGINT AS n_a_exact,
  (SELECT COUNT(*) FROM dist WHERE half = 1)::BIGINT AS n_b_exact),
exi AS (SELECT COUNT(*)::BIGINT AS n_inter_exact
        FROM (SELECT hv FROM dist WHERE half = 0) ia
        JOIN (SELECT hv FROM dist WHERE half = 1) ib USING (hv))
SELECT ku, theta, c,
       CASE WHEN ku < 512 THEN CAST(ku AS DOUBLE)
            ELSE CAST(ku - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                   / theta END
         AS est_union,
       CAST(c AS DOUBLE) / ku AS est_jaccard,
       (CASE WHEN ku < 512 THEN CAST(ku AS DOUBLE)
             ELSE CAST(ku - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                    / theta END)
         * c / ku AS est_inter,
       n_a_exact, n_b_exact, n_inter_exact,
       CAST(n_inter_exact AS DOUBLE)
         / (n_a_exact + n_b_exact - n_inter_exact) AS jaccard_exact
FROM uagg, cagg, ex, exi"""

  /** Mirror of Skew.keySkewReport(key = user_id, n = 5). */
  val diagKeySkew: String = """
WITH counts AS (
  SELECT user_id, COUNT(*)::BIGINT AS cnt FROM events GROUP BY user_id),
g AS (SELECT COUNT(*)::BIGINT AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             MAX(cnt) AS max_cnt
      FROM counts),
top AS (SELECT user_id, cnt FROM counts ORDER BY cnt DESC, user_id LIMIT 5)
SELECT t.user_id, t.cnt,
       (1000000 * t.cnt) // g.n_rows AS share_ppm,
       g.n_keys, g.n_rows, g.max_cnt,
       (1000 * g.n_rows) // g.n_keys AS mean_cnt_x1000,
       (1000 * g.max_cnt * g.n_keys) // g.n_rows AS skew_x1000
FROM top t, g"""

  /** Mirror of Diagnostics.tableProfile: exact counts and raw
    * min/max — no arithmetic touches the doubles. */
  val diagProfile: String = """
SELECT COUNT(*)::BIGINT AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_user_id,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_event_type,
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_props,
       CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ts,
       COUNT(DISTINCT user_id)::BIGINT AS n_distinct_user_id,
       COUNT(DISTINCT event_type)::BIGINT AS n_distinct_event_type,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts,
       MIN(user_id) AS min_user_id, MAX(user_id) AS max_user_id,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events"""

  /** Mirror of TextOps.sparseCosineNearDupsFrom: band-0 minhash
    * candidates (shared blocking-index CTEs), integer dot product and
    * norms, milli-cos² ≥ 250 via floor division. */
  val textSparseNeardup: String = shingleCtes + minhashSigCtes(2) + """,
keyed AS (
  SELECT doc_id, string_agg(CAST(mh AS VARCHAR), '|' ORDER BY j) AS block_key
  FROM sig GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) u
  GROUP BY doc_id, term),
norms AS (SELECT doc_id, SUM(tf * tf)::BIGINT AS norm2 FROM tf GROUP BY doc_id),
dots AS (
  SELECT c.doc_a, c.doc_b, SUM(x.tf * y.tf)::BIGINT AS dot
  FROM cand c
  JOIN tf x ON x.doc_id = c.doc_a
  JOIN tf y ON y.doc_id = c.doc_b AND y.term = x.term
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, dot, milli_cos2 FROM (
  SELECT d.doc_a, d.doc_b, d.dot,
         (d.dot * d.dot * 1000) // (na.norm2 * nb.norm2) AS milli_cos2
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b)
WHERE milli_cos2 >= 250"""

  /** Mirror of TextOps.perceptronTrain: 3 unrolled batch-perceptron
    * rounds over integer surface features — each round one
    * conditional-sum aggregate against the previous round's 1-row
    * weight relation. Margin/update arithmetic is pure int64. */
  val textPerceptronTrain: String = {
    def round(i: Int): String = s""",
w$i AS (
  SELECT w.w0 + SUM(CASE WHEN f.y * (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2
                                     + w.w3*f.x3) <= 0
                    THEN f.y * f.x0 ELSE 0 END) AS w0,
         w.w1 + SUM(CASE WHEN f.y * (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2
                                     + w.w3*f.x3) <= 0
                    THEN f.y * f.x1 ELSE 0 END) AS w1,
         w.w2 + SUM(CASE WHEN f.y * (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2
                                     + w.w3*f.x3) <= 0
                    THEN f.y * f.x2 ELSE 0 END) AS w2,
         w.w3 + SUM(CASE WHEN f.y * (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2
                                     + w.w3*f.x3) <= 0
                    THEN f.y * f.x3 ELSE 0 END) AS w3,
         SUM(CASE WHEN f.y * (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2
                              + w.w3*f.x3) <= 0 THEN 1 ELSE 0 END)
           AS n_mistakes
  FROM feats f, w${i - 1} w
  GROUP BY w.w0, w.w1, w.w2, w.w3)"""
    """
WITH feats AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END::BIGINT AS y,
         1::BIGINT AS x0,
         len(string_split(text, ' '))::BIGINT AS x1,
         (length(text) // 10)::BIGINT AS x2,
         len(list_filter(string_split(text, ' '), t -> len(t) > 6))::BIGINT AS x3
  FROM documents),
w0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2,
              0::BIGINT AS w3)""" +
      (1 to 3).map(round).mkString +
      (1 to 3).map(i =>
        s"""SELECT $i AS round, CAST(n_mistakes AS BIGINT) AS n_mistakes,
           |       CAST(w0 AS BIGINT) AS w0, CAST(w1 AS BIGINT) AS w1,
           |       CAST(w2 AS BIGINT) AS w2, CAST(w3 AS BIGINT) AS w3
           |FROM w$i""".stripMargin)
        .mkString("\n", "\nUNION ALL\n", "")
  }

  /** Mirror of TextOps.bpeEncodeFrom: re-derives the 3 trained merge
    * rules (the same unrolled rounds as [[textBpeTrain]]), encodes the
    * DISTINCT vocabulary with the same greedy list_reduce fold in rank
    * order, then aggregates per document — word count, total BPE token
    * count, and the first word's token sequence joined with '|'. */
  /** One BPE training round as DuckDB CTEs (shared by textBpeEncode /
    * textBpeIds): pair counts over w{i-1}, the round's winning pair
    * b$i, and the merged word-frequency frame w$i. */
  private def bpeTrainRound(i: Int): String = s""",
p$i AS (
  SELECT pair, SUM(freq)::BIGINT AS pair_count FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
             k -> toks[k] || ' ' || toks[k+1])) AS pair, freq
    FROM w${i - 1}) u GROUP BY pair),
b$i AS (
  SELECT string_split(pair, ' ')[1] AS bp_a,
         string_split(pair, ' ')[2] AS bp_b
  FROM p$i ORDER BY pair_count DESC, pair LIMIT 1),
w$i AS (
  SELECT list_reduce(list_transform(toks, t -> [t]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.bp_a
                             AND x[1] = b.bp_b
                         THEN acc[1:len(acc)-1] || [b.bp_a || b.bp_b]
                         ELSE acc || x END) AS toks, freq
  FROM w${i - 1}, b$i b)"""

  /** One vocab-encode round (e$i from e{i-1} via round i's winner). */
  private def bpeEncodeRound(i: Int): String = s""",
e$i AS (
  SELECT word, list_reduce(list_transform(toks, t -> [t]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.bp_a
                             AND x[1] = b.bp_b
                         THEN acc[1:len(acc)-1] || [b.bp_a || b.bp_b]
                         ELSE acc || x END) AS toks
  FROM e${i - 1}, b$i b)"""

  val textBpeEncode: String = {
    def trainRound(i: Int): String = bpeTrainRound(i)
    def encodeRound(i: Int): String = bpeEncodeRound(i)
    """
WITH w0 AS (
  SELECT string_split(word, '') AS toks, count(*)::BIGINT AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
  WHERE word <> ''
  GROUP BY word)""" +
      (1 to 3).map(trainRound).mkString + """,
e0 AS (
  SELECT DISTINCT word, string_split(word, '') AS toks
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
  WHERE word <> '')""" +
      (1 to 3).map(encodeRound).mkString + """,
dw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents),
cnt AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_words,
         SUM(len(toks))::BIGINT AS n_bpe_tokens
  FROM (SELECT doc_id, unnest(ws) AS word FROM dw) x
  JOIN e3 USING (word)
  GROUP BY doc_id)
SELECT d.doc_id,
       array_to_string(e.toks, '|') AS head_tokens,
       COALESCE(c.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens,
       COALESCE(c.n_words, 0)::BIGINT AS n_words
FROM dw d
LEFT JOIN e3 e ON e.word = d.ws[1]
LEFT JOIN cnt c USING (doc_id)"""
  }

  /** Mirror of TextOps.bpeIdsFrom: the same 3-round re-derivation of
    * the merge rules + vocab encode as [[textBpeEncode]] (CTEs w0..w3,
    * e0..e3), then the TokenizerStore vocabulary reconstructed exactly
    * as build() writes it — binary-sorted base alphabet ids 0..B-1,
    * merged tokens B..B+2 in rank order, min-id dedupe — and each
    * document's position-ordered token-id stream md5'd (the
    * textVocabEncode ids_md5 convention). Determinism notes: the
    * alphabet ROW_NUMBER orders by the bare token (binary collation,
    * same as Scala's sorted on String); md5('') covers the empty-text
    * document exactly like the Spark coalesce. */
  /** The shared WITH-chain of the tokenizer-id oracles: 3 training
    * rounds, vocab encode, alphabet/vocab ids, per-word id strings,
    * and the per-doc (nt, ids) frame `doc_ids`. */
  private val bpeIdsChain: String = {
    """
WITH w0 AS (
  SELECT string_split(word, '') AS toks, count(*)::BIGINT AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
  WHERE word <> ''
  GROUP BY word)""" +
      (1 to 3).map(bpeTrainRound).mkString + """,
e0 AS (
  SELECT DISTINCT word, string_split(word, '') AS toks
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
  WHERE word <> '')""" +
      (1 to 3).map(bpeEncodeRound).mkString + """,
alpha_ids AS (
  SELECT token,
         (ROW_NUMBER() OVER (ORDER BY token) - 1)::BIGINT AS token_id
  FROM (SELECT DISTINCT unnest(string_split(word, '')) AS token
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents) u
        WHERE word <> '')),
bc AS (SELECT COUNT(*)::BIGINT AS b FROM alpha_ids),
vocab AS (
  SELECT token, MIN(token_id)::BIGINT AS token_id FROM (
    SELECT token, token_id FROM alpha_ids
    UNION ALL SELECT b1.bp_a || b1.bp_b, bc.b + 0 FROM b1, bc
    UNION ALL SELECT b2.bp_a || b2.bp_b, bc.b + 1 FROM b2, bc
    UNION ALL SELECT b3.bp_a || b3.bp_b, bc.b + 2 FROM b3, bc)
  GROUP BY token),
word_ids AS (
  SELECT word, COUNT(*)::BIGINT AS n_toks,
         string_agg(v.token_id::VARCHAR, ',' ORDER BY tp.tpos) AS ids_str
  FROM (SELECT word, i AS tpos, toks[i] AS tok
        FROM e3, UNNEST(range(1, len(toks) + 1)) u(i)) tp
  JOIN vocab v ON v.token = tp.tok
  GROUP BY word),
dw AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents),
doc_ids AS (
  SELECT doc_id, SUM(wi.n_toks)::BIGINT AS nt,
         string_agg(wi.ids_str, ',' ORDER BY dp.wpos) AS ids
  FROM (SELECT doc_id, i AS wpos, ws[i] AS word
        FROM dw, UNNEST(range(1, len(ws) + 1)) u(i)) dp
  JOIN word_ids wi ON wi.word = dp.word
  GROUP BY doc_id)"""
  }

  val textBpeIds: String = bpeIdsChain + """
SELECT d.doc_id,
       COALESCE(di.nt, 0)::BIGINT AS n_bpe_tokens,
       md5(COALESCE(di.ids, '')) AS ids_md5
FROM documents d LEFT JOIN doc_ids di USING (doc_id)"""

  /** Mirror of TextOps.tokenizerFertility: per-language token/word/char
    * totals through the shared encode chain's word_ids, integer milli
    * fertility and chars-per-token via floor division. */
  val textTokenizerFertility: String = bpeIdsChain + """
SELECT lang, COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_words,
       SUM(wi.n_toks)::BIGINT AS n_bpe_tokens,
       SUM(length(word))::BIGINT AS n_chars,
       ((SUM(wi.n_toks) * 1000) // COUNT(*))::BIGINT AS fertility_milli,
       ((SUM(length(word)) * 1000) // SUM(wi.n_toks))::BIGINT
         AS chars_per_token_milli
FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      FROM documents) u
JOIN word_ids wi USING (word)
WHERE word <> ''
GROUP BY lang"""

  /** Mirror of TextOps.bpeDecodeRoundtrip: the oracle asserts the
    * LOSSLESSNESS THEOREM — decoding the id stream must reproduce the
    * whitespace-normalized original (BPE merges only concatenate, so
    * concat(tokens(w)) = w), with the token count re-derived through
    * the shared chain. The engine genuinely decodes ids → surfaces →
    * document; any id collision, ordering slip, or dropped token lands
    * on decoded_md5 / roundtrip_ok and breaks the hash. */
  val textBpeRoundtrip: String = bpeIdsChain + """
SELECT d.doc_id,
       COALESCE(di.nt, 0)::BIGINT AS n_bpe_tokens,
       md5(array_to_string(list_filter(string_split(d.text, ' '),
             w -> w <> ''), ' ')) AS decoded_md5,
       TRUE AS roundtrip_ok
FROM documents d LEFT JOIN doc_ids di USING (doc_id)"""

  /** Mirror of TextOps.tokenShardsExact over bpeIdsFrom counts: the
    * per-doc exact token counts re-derived through the same chain,
    * then the per-lang doc_id-ordered running-sum shard window —
    * shard_id = (running total before this doc) div 2048. */
  val corpusShardsBpe: String = bpeIdsChain + """
SELECT d.doc_id, d.lang,
       COALESCE(di.nt, 0)::BIGINT AS n_tokens,
       CAST((SUM(COALESCE(di.nt, 0)) OVER (PARTITION BY d.lang
          ORDER BY d.doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - COALESCE(di.nt, 0)) // 2048 AS BIGINT) AS shard_id
FROM documents d LEFT JOIN doc_ids di USING (doc_id)"""

  /** Mirror of TextOps.bpeTrainMerges: 3 unrolled BPE rounds. Each
    * round: adjacent-pair counts weighted by word frequency, top-1 by
    * (count DESC, pair), then the greedy left-to-right merge as a
    * list_reduce fold (tokens lifted to singleton lists so the
    * accumulator type is uniform — DuckDB's reduce seeds with the
    * first element). Single-pass ≡ fixpoint by the merged-token
    * invariant documented on the Spark side. */
  val textBpeTrain: String = {
    def round(i: Int): String = s""",
p$i AS (
  SELECT pair, SUM(freq)::BIGINT AS pair_count FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
             k -> toks[k] || ' ' || toks[k+1])) AS pair, freq
    FROM w${i - 1}) u GROUP BY pair),
b$i AS (
  SELECT string_split(pair, ' ')[1] AS bp_a,
         string_split(pair, ' ')[2] AS bp_b, pair_count
  FROM p$i ORDER BY pair_count DESC, pair LIMIT 1),
w$i AS (
  SELECT list_reduce(list_transform(toks, t -> [t]),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.bp_a
                             AND x[1] = b.bp_b
                         THEN acc[1:len(acc)-1] || [b.bp_a || b.bp_b]
                         ELSE acc || x END) AS toks, freq
  FROM w${i - 1}, b$i b)"""
    """
WITH w0 AS (
  SELECT string_split(word, '') AS toks, count(*)::BIGINT AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
  WHERE word <> ''
  GROUP BY word)""" +
      (1 to 3).map(round).mkString +
      (1 to 3).map(i =>
        s"""SELECT $i AS merge_rank, bp_a AS pair_left, bp_b AS pair_right,
           |       bp_a || bp_b AS merged, pair_count FROM b$i""".stripMargin)
        .mkString("\n", "\nUNION ALL\n", "")
  }

  /** Mirror of Diagnostics.qualityChecks: four (check, observed,
    * threshold, passed) rows — PK uniqueness, FK integrity via anti
    * join, integer milli null-rate, value domain. The COALESCE
    * mirrors the Spark side's fail-closed NULL gate: an empty checked
    * table yields NULL `observed`, and a DQ gate must read that as
    * FAILED in both engines, not diverge in exactly the
    * missing-table case. */
  val diagChecks: String = """
SELECT check_name, CAST(observed AS BIGINT) AS observed,
       CAST(threshold AS BIGINT) AS threshold,
       COALESCE(observed <= threshold, false) AS passed
FROM (
  SELECT 'orders_pk_unique' AS check_name,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS observed, 0 AS threshold
  FROM orders
  UNION ALL
  SELECT 'orders_customer_ri',
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)), 0
  UNION ALL
  SELECT 'events_user_null_milli',
         (SELECT (1000 * SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END))
                 // COUNT(*) FROM events), 100
  UNION ALL
  SELECT 'lineitem_qty_domain',
         (SELECT SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                          THEN 1 ELSE 0 END) FROM lineitem), 0) t"""

  /** Mirror of Diagnostics.equiDepthHistogram: ntile(10) over the
    * (o_totalprice, o_orderkey) total order — identical bucket
    * membership in both engines because the order is total — then
    * raw min/max and an exact count per bucket. */
  val diagHistogram: String = """
SELECT bucket, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       COUNT(*)::BIGINT AS n_rows
FROM (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders)
GROUP BY bucket"""

  /** Mirror of TextOps.weightedSample: integerized bottom-k weighted
    * priorities — same md5-residue family as the other samplers, full
    * 32-bit width, floor division so the ranking is engine-exact. */
  val sampleWeighted: String = """
SELECT doc_id, lang, weight, priority FROM (
  SELECT doc_id, lang,
         1 + LEAST(n_chars // 100, 49) AS weight,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          * 1000000) // (1 + LEAST(n_chars // 100, 49)) AS priority
  FROM documents) t
ORDER BY priority, doc_id
LIMIT 500"""

  /** Mirror of TextOps.hashFeatures: hashing-trick sparse tf vectors,
    * top-8 of 64 buckets per doc, same md5-residue bucket hash. */
  val textHashFeatures: String = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
b AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
         COUNT(*) AS tf
  FROM tok WHERE tok <> '' GROUP BY 1, 2),
r AS (
  SELECT doc_id, bucket, tf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf DESC, bucket) AS rk
  FROM b)
SELECT doc_id, bucket, tf, CAST(rk AS INT) AS rk FROM r WHERE rk <= 8"""

  /** Mirror of Analytics.forecastRevenue (TPC-H Q6 shape) and its
    * sql_q6_forecast twin: triple-predicate scan + exact decimal
    * aggregate, grouped by return flag. */
  val q6Forecast: String = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
GROUP BY l_returnflag"""

  /** Mirror of Analytics.importantStock (TPC-H Q11 shape, adapted):
    * per-part shipped value at one nation's suppliers in exact int64
    * cents, kept above 7/2 of the average per-part value — the
    * self-scaling threshold, floor-divided identically in both
    * engines. */
  val q11ImportantStock: String = """
WITH vals AS (
  SELECT l.l_partkey AS p_partkey,
         SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             * CAST(l.l_quantity AS BIGINT)) AS value_cents
  FROM lineitem l
  WHERE l.l_suppkey IN (
    SELECT s.s_suppkey FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_1')
  GROUP BY l.l_partkey)
SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents
FROM vals,
     (SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts
      FROM vals) t
WHERE value_cents > (total_cents * 7) // (2 * n_parts)"""

  /** Mirror of Analytics.promoSuppliers (TPC-H Q20 shape, adapted):
    * suppliers shipping more than half a promo part's year quantity,
    * restricted to one nation. */
  val q20PromoSuppliers: String = """
WITH per_supp AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%bolt%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l.l_partkey, l.l_suppkey),
dom AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM per_supp)
  WHERE supp_qty * 2 > part_qty)
SELECT s.s_name, s.s_suppkey
FROM dom
JOIN supplier s ON dom.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_1'"""
}
