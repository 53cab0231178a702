package graft

import graft.functions.StatusRange
import org.scalatest.funsuite.AnyFunSuite

/** Pinned to InsecureInvokeHTTP.java:1421-1445. */
class StatusRangeSpec extends AnyFunSuite {

  test("ranges + exacts: '200-299,304'") {
    val s = StatusRange.parse("200-299,304")
    assert(s.matches(200) && s.matches(250) && s.matches(299) && s.matches(304))
    assert(!s.matches(199) && !s.matches(300) && !s.matches(404))
  }

  test("whitespace tolerated around tokens and range parts (:1426,1430-1431)") {
    val s = StatusRange.parse(" 200 - 204 , 418 ")
    assert(s.matches(202) && s.matches(418) && !s.matches(205))
  }

  test("null/empty spec defaults to 2xx (:1442-1444)") {
    for (spec <- Seq(null, "", "  ")) {
      val s = StatusRange.parse(spec)
      assert(s.matches(200) && s.matches(299) && !s.matches(300) && !s.matches(199))
    }
  }

  test("column predicate matches the scala-side semantics") {
    val spark = TestSpark.spark
    import spark.implicits._
    val codes = Seq(199, 200, 250, 299, 300, 304, 404).toDF("code")
    val got = codes.filter(StatusRange.predicate(org.apache.spark.sql.functions.col("code"), "200-299,304"))
      .as[Int].collect().sorted
    assert(got.toSeq == Seq(200, 250, 299, 304))
  }
}
