package graft

import graft.operators.KeyFields
import graft.operators.KeyFields.KeySpec

/** KeyFieldBased `-k` spec parsing and ordering, differential against the
  * real unix `sort` binary (LC_ALL=C) — the reference semantics
  * (KeyFieldBasedComparator.java:46) ARE unix sort's. */
class KeyFieldsSpec extends SparkSpec {

  test("parses pos1, pos2 and flag combinations") {
    assert(KeyFields.parse("-k2,3nr") ===
      Seq(KeySpec(2, Some(3), numeric = true, reverse = true)))
    assert(KeyFields.parse("-k1") ===
      Seq(KeySpec(1, None, numeric = false, reverse = false)))
    assert(KeyFields.parse("-k2n -k1r") === Seq(
      KeySpec(2, None, numeric = true, reverse = false),
      KeySpec(1, None, numeric = false, reverse = true)))
    assert(KeyFields.parse("-k3,3") ===
      Seq(KeySpec(3, Some(3), numeric = false, reverse = false)))
    intercept[IllegalArgumentException](KeyFields.parse("k2"))
    intercept[IllegalArgumentException](KeyFields.parse("-kx"))
  }

  test("parses pos.char offsets") {
    assert(KeyFields.parse("-k2.3,2.5") === Seq(
      KeySpec(2, Some(2), numeric = false, reverse = false,
        fromChar = 3, toChar = Some(5))))
    // end char 0 = last char of the field (GNU sort)
    assert(KeyFields.parse("-k2.3,2.0") === Seq(
      KeySpec(2, Some(2), numeric = false, reverse = false,
        fromChar = 3, toChar = None)))
    assert(KeyFields.parse("-k1.2,3.1nr") === Seq(
      KeySpec(1, Some(3), numeric = true, reverse = true,
        fromChar = 2, toChar = Some(1))))
    intercept[IllegalArgumentException](KeyFields.parse("-k1.0"))
  }

  private val lines = Seq(
    "apple 12 3", "pear 4 10", "plum 12 10", "fig 4 3", "date 100 1",
    "kiwi 4 10", "lime 12 3", "yuzu .5 2", "mango -.25 7")

  /** Ground truth: the real unix sort binary, C locale, stable. */
  private def unixSort(flags: String): Seq[String] = {
    import scala.sys.process._
    val cmd = Seq("env", "LC_ALL=C", "sort", "-s", "-t", " ") ++
      flags.split(" ").toSeq
    val in = new java.io.ByteArrayInputStream(
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    (cmd #< in).lazyLines_!.toList
  }

  test("sorted matches unix sort -k2,3nr plus a stable tie-break") {
    import spark.implicits._
    val df = lines.toDF("line")
    // graft order: numeric desc on fields 2..3 span, then line asc as an
    // explicit deterministic tie-break
    val got = KeyFields.sorted(df, "line", " ", "-k2,3nr -k1")
      .collect().map(_.getString(0)).toSeq
    val want = unixSort("-k2,3nr -k1,1")
    assert(got === want)
  }

  test("sorted matches unix sort on a plain string field") {
    import spark.implicits._
    val df = lines.toDF("line")
    val got = KeyFields.sorted(df, "line", " ", "-k3 -k1")
      .collect().map(_.getString(0)).toSeq
    val want = unixSort("-k3 -k1,1")
    assert(got === want)
  }

  private val charLines = Seq(
    "aa 12345 19", "bb 12954 28", "cc 99111 37", "dd 12321 46",
    "ee 45999 55", "ff 12345 64", "gg 459 73", "hh 1 82")

  private def unixSortOf(input: Seq[String], flags: String): Seq[String] = {
    import scala.sys.process._
    val cmd = Seq("env", "LC_ALL=C", "sort", "-s", "-t", " ") ++
      flags.split(" ").toSeq
    val in = new java.io.ByteArrayInputStream(
      (input.mkString("\n") + "\n").getBytes("UTF-8"))
    (cmd #< in).lazyLines_!.toList
  }

  test("sorted matches unix sort -k2.3,2.5 (char offsets within a field)") {
    import spark.implicits._
    val got = KeyFields.sorted(charLines.toDF("line"), "line", " ",
      "-k2.3,2.5 -k1")
      .collect().map(_.getString(0)).toSeq
    assert(got === unixSortOf(charLines, "-k2.3,2.5 -k1,1"))
  }

  test("sorted matches unix sort -k1.2,2.3 (char span crossing a field)") {
    import spark.implicits._
    val got = KeyFields.sorted(charLines.toDF("line"), "line", " ",
      "-k1.2,2.3 -k1")
      .collect().map(_.getString(0)).toSeq
    assert(got === unixSortOf(charLines, "-k1.2,2.3 -k1,1"))
  }

  test("sorted matches unix sort -k2.2,2.0n (numeric char-offset key)") {
    import spark.implicits._
    val got = KeyFields.sorted(charLines.toDF("line"), "line", " ",
      "-k2.2,2.0n -k1")
      .collect().map(_.getString(0)).toSeq
    assert(got === unixSortOf(charLines, "-k2.2,2.0n -k1,1"))
  }

  test("partitioned co-locates equal key spans") {
    import spark.implicits._
    val df = lines.toDF("line")
    val parts = KeyFields.partitioned(df, "line", " ", "-k2,2", 4)
      .rdd.mapPartitionsWithIndex { (i, it) =>
        it.map(r => r.getString(0).split(" ")(1) -> i)
      }.collect()
    // every row with the same field-2 value is in the same partition
    parts.groupBy(_._1).foreach { case (k, ps) =>
      assert(ps.map(_._2).distinct.length === 1, s"key $k split across partitions")
    }
  }
}
