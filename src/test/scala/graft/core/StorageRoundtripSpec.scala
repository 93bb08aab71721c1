package graft.core

import graft.SparkSpecBase
import java.nio.file.Files
import scala.util.Random

/** Spark analog of the reference's storage-layer test
  * (environment_test, database.rs:206-218 / FIXTURES.md §4): a ~10 MB
  * payload written and read back with byte-level equality, plus delete.
  * The LMDB chunked-blob layer maps to parquet binary columns; chunking is
  * parquet row groups — no custom code to test, only the roundtrip
  * guarantee. */
class StorageRoundtripSpec extends SparkSpecBase {
  import spark.implicits._

  test("10 MB binary payload roundtrips through parquet byte-exactly") {
    val rnd = new Random(42)
    // 100 rows x 100 KB = ~10 MB, like the reference's 10 MB blob
    val rows = (0 until 100).map { i =>
      val bytes = new Array[Byte](100 * 1024)
      rnd.nextBytes(bytes)
      (i.toLong, bytes)
    }
    val dir = Files.createTempDirectory("graft_blob_").toString + "/blob"
    rows.toDF("id", "payload").write.parquet(dir)

    val back = spark.read.parquet(dir)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(back.length == 100)
    rows.zip(back).foreach { case ((id, bytes), (gotId, gotBytes)) =>
      assert(id == gotId)
      assert(java.util.Arrays.equals(bytes, gotBytes), s"row $id bytes differ")
    }

    // delete (reference: database.rs:134-161)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, true) && !fs.exists(p))
  }
}
