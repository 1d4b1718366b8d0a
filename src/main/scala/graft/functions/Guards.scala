package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{assert_true, coalesce, lit}

/** The repo's THROWING row-guard idiom, centralized. Used as
  * `df.filter(Guards.assertFilter(cond, "message"))`: keeps every row
  * where `cond` is TRUE and THROWS — never silently drops — otherwise.
  *
  * The double coalesce is load-bearing. Outer: `assert_true(true)`
  * returns NULL, and a bare NULL filter result would DROP the row —
  * `coalesce(..., true)` keeps it. Inner: `assert_true(NULL)` returns
  * NULL instead of throwing, so a NULL condition would silently PASS the
  * guard — `coalesce(cond, false)` forces it to throw (the x8f
  * overflow-guard pitfall: a NULL-armored guard must fail closed).
  * Hand-rolled copies of this pattern have re-risked the NULL-swallowing
  * half once already; new guards should use this helper.
  */
object Guards {
  /** Column-message form, for guards whose message interpolates row
    * values (e.g. the offending n/m in the q36 moments guard). */
  def assertFilter(cond: Column, msg: Column): Column =
    coalesce(
      assert_true(coalesce(cond, lit(false)), msg).cast("boolean"),
      lit(true))

  def assertFilter(cond: Column, msg: String): Column =
    assertFilter(cond, lit(msg))
}
