package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** NumPy `.npy` ingestion — the de-facto dump format for embedding
  * matrices (every Python-side embedder ends in `np.save`); the
  * embeddings-shaped tables the sim/ operators consume start here.
  * Format per the public NEP-1 spec: `\\x93NUMPY`, one-byte
  * major/minor version, a little-endian header length (2 bytes at
  * v1, 4 bytes at v2+), an ASCII dict literal
  * `{'descr': '<f4', 'fortran_order': False, 'shape': (N, d)}`
  * padded to 64-byte alignment, then the raw little-endian values.
  *
  * Supported: C-order (`fortran_order: False`) little-endian float32
  * (`<f4`) and float64 (`<f8`, downcast to float — the sim/ operators
  * quantize to 1e-4 integer units anyway, far coarser than a float's
  * 24-bit mantissa), 2-D shape for [[vectors]], 1-D for [[scalars]].
  * Big-endian (`>`), fortran order, and other dtypes REJECT LOUDLY —
  * silently transposing or byte-swapping an embedding matrix is the
  * kind of corruption no downstream check catches.
  *
  * Scale shape (the WARC doctrine): FILE-level parallelism via
  * `sc.binaryFiles` — one dump per task, thousands of dumps fan out;
  * STREAMING row-by-row parse off the PortableDataStream (one
  * row of d values buffered — constant memory, never a whole-matrix
  * byte[]); a truncated tail (EOF mid-row) ends THAT file's iterator
  * deterministically, complete rows before it are kept (the mp4/WARC
  * contract). `.npy.gz` reads transparently. Rows carry their 0-based
  * matrix index as `vec_id`, so a sharded dump re-keys by
  * (file, vec_id) and a single-writer dump keys by vec_id alone —
  * both deterministic, no zipWithIndex. Because every row is a fixed
  * `d·itemsize` stride, a single huge dump is offset-splittable in
  * principle; the industry ships sharded dumps instead, and this
  * reader's unit of parallelism is the shard.
  */
object Npy {

  case class NpyVector(file: String, vec_id: Long, embedding: Array[Float])
  case class NpyScalar(file: String, idx: Long, value: Double)

  private case class Header(descr: String, fortran: Boolean,
                            shape: Seq[Long])

  private def readHeader(in: DataInputStream, file: String): Header = {
    val magic = new Array[Byte](6)
    in.readFully(magic)
    require(magic.sameElements("NUMPY".getBytes("ISO-8859-1")),
      s"$file: not an npy file (bad magic)")
    val major = in.readUnsignedByte(); in.readUnsignedByte()
    val hlen =
      if (major == 1) {
        val b = new Array[Byte](2); in.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
      } else {
        val b = new Array[Byte](4); in.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      }
    val hb = new Array[Byte](hlen)
    in.readFully(hb)
    val h = new String(hb, "ISO-8859-1")
    val descr = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"$file: npy header has no descr"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r
      .findFirstMatchIn(h).map(_.group(1) == "True").getOrElse(false)
    val shape = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(h)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        s"$file: npy header has no shape"))
    Header(descr, fortran, shape)
  }

  private def itemSize(descr: String, file: String): Int = descr match {
    case "<f4" => 4
    case "<f8" => 8
    case other => throw new IllegalArgumentException(
      s"$file: unsupported npy dtype '$other' — this reader takes " +
        "little-endian float32/float64 ('<f4'/'<f8'); byte-swapping or " +
        "casting silently would corrupt the matrix")
  }

  private def rowIterator(file: String, in: DataInputStream, d: Int,
                          isize: Int, rows: Long): Iterator[Array[Float]] =
    new Iterator[Array[Float]] {
      private var i = 0L
      private var done = false
      private val buf = new Array[Byte](d * isize)
      override def hasNext: Boolean = !done && i < rows
      override def next(): Array[Float] = {
        try {
          in.readFully(buf)
          i += 1
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          val out = new Array[Float](d)
          var j = 0
          if (isize == 4) { val fb = bb.asFloatBuffer()
            while (j < d) { out(j) = fb.get(j); j += 1 } }
          else { val db = bb.asDoubleBuffer()
            while (j < d) { out(j) = db.get(j).toFloat; j += 1 } }
          out
        } catch { case _: EOFException => done = true; null }
      }
    }.takeWhile(_ != null)

  private def open(file: String,
                   raw: java.io.InputStream): DataInputStream = {
    val b = new BufferedInputStream(raw, 1 << 16)
    new DataInputStream(
      if (file.endsWith(".gz")) new GZIPInputStream(b, 1 << 16) else b)
  }

  /** 2-D dumps → (file, vec_id, embedding float[]): the embeddings
    * table shape. vec_id is the row's 0-based matrix index.
    */
  def vectors(spark: SparkSession, path: String): Dataset[NpyVector] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = open(file, pds.open())
        val h = readHeader(in, file)
        require(!h.fortran,
          s"$file: fortran_order npy not supported — transpose at write")
        require(h.shape.length == 2,
          s"$file: vectors() needs a 2-D dump, got shape ${h.shape}")
        val isize = itemSize(h.descr, file)
        val d = h.shape(1).toInt
        closeOnEnd(
          rowIterator(file, in, d, isize, h.shape.head).zipWithIndex
            .map { case (v, i) => NpyVector(file, i.toLong, v) },
          in)
      }
      .toDS()
  }

  /** 1-D dumps → (file, idx, value): score/weight columns. */
  def scalars(spark: SparkSession, path: String): Dataset[NpyScalar] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = open(file, pds.open())
        val h = readHeader(in, file)
        require(!h.fortran, s"$file: fortran_order npy not supported")
        require(h.shape.length == 1,
          s"$file: scalars() needs a 1-D dump, got shape ${h.shape}")
        val isize = itemSize(h.descr, file)
        closeOnEnd(
          rowIterator(file, in, 1, isize, h.shape.head).zipWithIndex
            .map { case (v, i) => NpyScalar(file, i.toLong, v(0).toDouble) },
          in)
      }
      .toDS()
  }

  /** Embeddings-table view over a shard glob: deterministic global ids
    * from the portable hash of (file, row) when `hashIds`, else the
    * per-file row index (single-dump convention).
    */
  def embeddings(spark: SparkSession, path: String,
                 hashIds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val v = vectors(spark, path).toDF()
    if (!hashIds) v.select(col("vec_id"), col("embedding"), col("file"))
    else v.select(
      graft.util.Hashing.portableHash64(
        concat_ws(":", col("file"), col("vec_id"))).as("vec_id"),
      col("embedding"), col("file"))
  }

  private def closeOnEnd[T](it: Iterator[T], in: InputStream): Iterator[T] =
    new Iterator[T] {
      private var closed = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; in.close() }
        h
      }
      override def next(): T = it.next()
    }
}
