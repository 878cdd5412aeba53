package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the Relational* operator traits. */
trait RelationalBase {

  /** FK edges of the schema as (name, fact, fk, dim, pk) — the single
    * source of truth consumed by BOTH the dq04 DataFrame implementation
    * and its oracle SQL builder, so an edge added or renamed in one
    * place cannot silently desynchronize the query from its gate.
    */
  protected val FkEdges: Seq[(String, String, String, String, String)] = Seq(
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"))

  protected def tmpTag(dir: String): String = graft.Fs.tmpTag(dir)

  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent sum of a money-like double column. */
  protected def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
}
