package graft

import java.nio.file.Files

import graft.etl.Sources

/** Byte-oriented file source — the reference's `ReadWriter::read($length,
  * $offset)` contract (sdk/src/IO/ReadWriter.php:99-147) over Spark's
  * binaryFile format, plus plan-time retry of the JDBC source.
  */
class BinarySourceSpec extends SparkSpec {

  test("binaryFiles reads whole payloads; binaryRange slices by offset") {
    val dir = Files.createTempDirectory("graft_bin")
    val bytes = Array.tabulate[Byte](10)(i => (i + 65).toByte) // "ABCDEFGHIJ"
    Files.write(dir.resolve("one.bin"), bytes)

    val whole = Sources.binaryFiles(spark, dir.toString)
    val row = whole.select("content", "length").collect()(0)
    assert(row.getAs[Array[Byte]]("content").toSeq === bytes.toSeq)
    assert(row.getAs[Long]("length") === 10L)

    // read(length=3, offset=2) → "CDE"
    val slice = Sources.binaryRange(spark, dir.toString, offset = 2, len = 3)
      .collect()(0)
    assert(new String(slice.getAs[Array[Byte]]("chunk"), "UTF-8") === "CDE")
    assert(slice.getAs[Long]("chunk_len") === 3L)

    // read past EOF truncates (reference returns the short tail)
    val tail = Sources.binaryRange(spark, dir.toString, offset = 8, len = 5)
      .collect()(0)
    assert(new String(tail.getAs[Array[Byte]]("chunk"), "UTF-8") === "IJ")
  }

  test("jdbc source retries plan-time connection failures, then throws") {
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException] {
      Sources.jdbc(spark, "jdbc:nosuchdb:x", "t", Map.empty,
        attempts = 3, retryDelayMs = 20)
    }
    assert(e.getMessage.contains("Too many attempt"))
    assert((System.nanoTime() - t0) / 1e6 >= 40)
  }
}
