package graft.spark

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: a typo'd oracle key would silently demote a
  * query to the weaker rows-only check (or orphan the oracle entirely). */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names a registered query") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracle keys: ${o -- q}")
  }

  test("every registered query carries an oracle (zero rows-only queries)") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o) == Set.empty,
      s"unexpected rows-only queries: ${q -- o}")
  }

  test("dump-reading oracles only reference dumps that Verify actually writes") {
    val known = graft.SparkEntry.queries.keySet ++ graft.Verify.fixtureDumps
    val refs = graft.SparkEntry.oracleSql.collect {
      case (k, sql) if sql.contains("__VERIFY_OUT__") =>
        k -> "__VERIFY_OUT__/([a-z_0-9]+)/".r.findAllMatchIn(sql).map(_.group(1)).toSet
    }
    refs.foreach { case (k, dumps) =>
      assert(dumps.nonEmpty, s"$k carries the placeholder but references no dump")
      dumps.foreach(d => assert(known.contains(d),
        s"oracle $k reads dump of unknown query/fixture $d"))
    }
  }
}
