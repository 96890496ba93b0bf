package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Dialect

class DialectSpec extends AnyFunSuite {

  test("np.* rewrites to np_* outside literals") {
    assert(Dialect.rewrite("select np.log(x), NP.sqrt(y) from t") ==
      "select np_log(x), NP_sqrt(y) from t")
  }

  test("np. inside string literal untouched") {
    assert(Dialect.rewrite("select 'np.log' from t") == "select 'np.log' from t")
  }

  test("np. as part of a longer identifier untouched") {
    assert(Dialect.rewrite("select anp.log(x) from t") == "select anp.log(x) from t")
  }

  test("# becomes ^ outside literals only") {
    assert(Dialect.rewrite("select a # b, '#lit', \"q#id\" from t") ==
      "select a ^ b, '#lit', \"q#id\" from t")
  }

  test("firstFromTable finds the bound view name") {
    assert(Dialect.firstFromTable("select * from lineitem where x='from y'")
      .contains("lineitem"))
    assert(Dialect.firstFromTable("select 1").isEmpty)
  }
}
