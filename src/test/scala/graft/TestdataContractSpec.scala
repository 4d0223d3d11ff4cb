package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables

/** Testdata-contract canary: pins the ENGINE-SIDE schema (through
  * `Tables.t`, i.e. after the events ts normalization) of all 10 harness
  * tables at every scale factor. When `/root/testdata` is regenerated
  * with a different schema or physical encoding, this suite fails with a
  * readable schema diff instead of the round discovering it as dozens of
  * broken-query corpses (what happened in round 8, when an upstream
  * switch from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) silently took out
  * all 23 events-reading queries).
  *
  * `events.ts` is asserted as a session-zone TIMESTAMP *whatever* the
  * file's physical encoding — that is the normalization contract the
  * whole query corpus relies on; the raw file may ship nanos-as-long,
  * TIMESTAMP, or TIMESTAMP_NTZ and all must land here identically.
  */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // name:dtype in file order, dtype as Spark's simpleString.
  private val contract: Map[String, String] = Map(
    "region" -> "r_regionkey:int, r_name:string",
    "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
      "c_acctbal:double, c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, p_type:string, " +
      "p_size:int, p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
      "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
      "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
      "l_discount:double, l_tax:double, l_returnflag:string, " +
      "l_linestatus:string, l_shipdate:timestamp_ntz"),
    // ts is TIMESTAMP (not ntz, not bigint) BY CONTRACT after Tables.t,
    // independent of the file's physical encoding du jour.
    "events" -> ("event_id:bigint, ts:timestamp, user_id:bigint, " +
      "event_type:string, value:double, props:string"),
    "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); (table, expected) <- contract.toSeq.sortBy(_._1))
    test(s"$sf/$table arrives with the contracted engine-side schema") {
      val df = Tables.t(spark, s"/root/testdata/$sf", table)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got === expected,
        s"\nTESTDATA CONTRACT BREACH for $sf/$table —\n" +
          s"  expected: $expected\n  arrived:  $got\n" +
          "Upstream testdata regenerated with a new schema/encoding? " +
          "Fix Tables.t (and this contract) deliberately, per column.")
    }
}
