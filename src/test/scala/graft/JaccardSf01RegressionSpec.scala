package graft

class JaccardSf01RegressionSpec extends SparkSpec {
  test("jaccard pairs at sf0.1 produce the DuckDB-verified pair count") {
    val n = SparkEntry.queries("q26_jaccard_pairs")(spark, "/root/testdata/sf0.1").count()
    println(s"q26 sf0.1 rows = $n")
    assert(n === 2288904L) // DuckDB brute-force count, computed earlier
  }
}
