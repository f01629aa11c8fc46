"""Fixture queries from FIXTURES.md (JOB-shaped SPJA over the TPC-H-ish
testdata)."""

Q_CHAIN_3 = """
SELECT MIN(o.o_totalprice) AS min_price, MIN(c.c_name) AS min_name
FROM lineitem l, orders o, customer c
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND l.l_quantity > 30
"""

Q_STAR_4 = """
SELECT MIN(l.l_extendedprice) AS min_ep, MIN(p.p_name) AS min_part
FROM lineitem l, orders o, part p, supplier s
WHERE l.l_orderkey = o.o_orderkey AND l.l_partkey = p.p_partkey
  AND l.l_suppkey = s.s_suppkey
  AND p.p_size < 20 AND o.o_orderstatus = 'F'
"""

Q_CYCLE_7 = """
SELECT MIN(l.l_extendedprice) AS min_ep
FROM lineitem l, orders o, customer c, supplier s, nation n1, nation n2, region r
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = n1.n_nationkey AND s.s_nationkey = n2.n_nationkey
  AND n1.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA' AND c.c_acctbal > 0
"""

Q_CROSS_2 = """
SELECT MIN(r.r_name) AS min_r, MIN(p.p_brand) AS min_b
FROM region r, part p
WHERE r.r_regionkey < 3 AND p.p_size = 5
"""

Q_SELFJOIN = """
SELECT MIN(c.c_name) AS min_cust, MIN(s.s_name) AS min_supp
FROM customer c, supplier s, nation n1, nation n2
WHERE c.c_nationkey = n1.n_nationkey AND s.s_nationkey = n2.n_nationkey
  AND n1.n_regionkey = n2.n_regionkey
  AND c.c_acctbal > 100
"""

ALL = {
    "q_chain_3": Q_CHAIN_3,
    "q_star_4": Q_STAR_4,
    "q_cycle_7": Q_CYCLE_7,
    "q_cross_2": Q_CROSS_2,
    "q_selfjoin": Q_SELFJOIN,
}
