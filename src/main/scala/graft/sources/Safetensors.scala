package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  EOFException, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** safetensors export/ingest — the HF-ecosystem tensor container an
  * embedding corpus ships to trainers and vector stores as (the
  * `.npy` source's modern sibling; TfRecord carries examples, this
  * carries TENSORS). Everything here is the PUBLIC format
  * (github.com/huggingface/safetensors): a file is
  *
  *   u64-LE header_len ‖ header JSON (UTF-8) ‖ data buffer
  *
  * where the header maps tensor name → {"dtype", "shape",
  * "data_offsets": [begin, end)} with offsets into the data buffer
  * (contiguous, non-overlapping), plus an optional "__metadata__"
  * string map. Data is little-endian, C-order, no alignment padding
  * required. Only the two dtypes this engine ships are implemented:
  * F32 (embeddings) and I64 (ids) — anything else throws on read
  * rather than misparse.
  *
  * Scale shape: write is one `.safetensors` file per partition — the
  * format's tensors are CONTIGUOUS, so a shard's header cannot be
  * written until its row count is known; the writer streams the data
  * section to a temp file at constant memory (never a whole-partition
  * array), then emits header + temp copy. Rows per partition is the
  * shard-size knob exactly as with every other export. Read is
  * file-level parallelism via binaryFiles with a streaming slice of
  * the two tensors; a header naming offsets beyond the file, a ragged
  * row, or an unknown dtype throws loudly (the TfRecord CRC doctrine:
  * silent truncation of a training shard is the corruption nothing
  * downstream catches).
  */
object Safetensors {

  private val mapper = new ObjectMapper

  /** Write `df`'s (idCol: LONG, vecCol: ARRAY<FLOAT>) as one
    * safetensors file per partition holding two tensors named after
    * the columns: I64 `[n]` ids and F32 `[n, dim]` vectors (row i of
    * each corresponds). `dim` is taken from the first row of each
    * partition; a ragged or null row THROWS — a tensor with silently
    * skipped rows would desynchronize ids from vectors. Empty
    * partitions write nothing.
    */
  def write(df: DataFrame, dir: String, idCol: String, vecCol: String): Unit = {
    val idIdx = df.schema.fieldIndex(idCol)
    val vecIdx = df.schema.fieldIndex(vecCol)
    new java.io.File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { case (pid, it) =>
      if (!it.hasNext) Iterator.single(0L)
      else {
        val file = new java.io.File(dir, f"part-$pid%05d.safetensors")
        val tmpV = java.io.File.createTempFile(s"st-v-$pid-", ".bin")
        val tmpI = java.io.File.createTempFile(s"st-i-$pid-", ".bin")
        var n = 0L
        var dim = -1
        val vOut = new BufferedOutputStream(new FileOutputStream(tmpV), 1 << 16)
        val iOut = new BufferedOutputStream(new FileOutputStream(tmpI), 1 << 16)
        try {
          it.foreach { row =>
            val vec = row.getSeq[Float](vecIdx)
            if (row.isNullAt(idIdx) || vec == null)
              throw new IllegalArgumentException(
                s"safetensors row $n: null $idCol/$vecCol — a skipped row " +
                  "would desynchronize the id and vector tensors")
            if (dim < 0) dim = vec.length
            if (vec.length != dim)
              throw new IllegalArgumentException(
                s"safetensors row $n: ragged vector (${vec.length} vs $dim)")
            val vb = ByteBuffer.allocate(4 * dim).order(ByteOrder.LITTLE_ENDIAN)
            vec.foreach(vb.putFloat)
            vOut.write(vb.array())
            val ib = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            ib.putLong(row.getLong(idIdx))
            iOut.write(ib.array())
            n += 1
          }
        } finally { vOut.close(); iOut.close() }
        // data buffer = [vector tensor][id tensor]; offsets in bytes
        val vBytes = 4L * dim * n
        val iBytes = 8L * n
        val header = mapper.createObjectNode()
        val vNode = header.putObject(vecCol)
        vNode.put("dtype", "F32")
        vNode.putArray("shape").add(n).add(dim.toLong)
        vNode.putArray("data_offsets").add(0L).add(vBytes)
        val iNode = header.putObject(idCol)
        iNode.put("dtype", "I64")
        iNode.putArray("shape").add(n)
        iNode.putArray("data_offsets").add(vBytes).add(vBytes + iBytes)
        val hj = mapper.writeValueAsBytes(header)
        val out = new BufferedOutputStream(new FileOutputStream(file), 1 << 16)
        try {
          val lb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
          lb.putLong(hj.length.toLong)
          out.write(lb.array())
          out.write(hj)
          for (t <- Seq(tmpV, tmpI)) {
            val in = new BufferedInputStream(new FileInputStream(t), 1 << 16)
            try {
              val buf = new Array[Byte](1 << 16)
              var r = in.read(buf)
              while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
            } finally in.close()
          }
        } finally { out.close(); tmpV.delete(); tmpI.delete(); () }
        Iterator.single(n)
      }
    }.count()
    ()
  }

  /** Read a path/glob of `.safetensors` files written by [[write]]
    * (or any file carrying one I64 `[n]` and one F32 `[n, dim]`
    * tensor under the given names) back as (`idCol` LONG, `vecCol`
    * ARRAY<FLOAT>) rows. File-level parallelism; each file is
    * streamed once in data-offset order.
    */
  def read(spark: SparkSession, path: String, idCol: String,
           vecCol: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val in = new DataInputStream(
          new BufferedInputStream(pds.open(), 1 << 16))
        try {
          val lb = new Array[Byte](8)
          in.readFully(lb)
          val hLen = ByteBuffer.wrap(lb).order(ByteOrder.LITTLE_ENDIAN).getLong
          if (hLen <= 0 || hLen > (1L << 26))
            throw new IllegalArgumentException(
              s"$file: implausible safetensors header length $hLen")
          val hb = new Array[Byte](hLen.toInt)
          in.readFully(hb)
          val root = mapper.readTree(new String(hb, UTF_8))
          def tensor(name: String, dtype: String) = {
            val t = root.get(name)
            if (t == null)
              throw new IllegalArgumentException(s"$file: no tensor '$name'")
            if (t.get("dtype").asText() != dtype)
              throw new IllegalArgumentException(
                s"$file: $name dtype ${t.get("dtype").asText()} != $dtype")
            val sh = t.get("shape")
            val off = t.get("data_offsets")
            (Seq.tabulate(sh.size())(i => sh.get(i).asLong()),
              off.get(0).asLong(), off.get(1).asLong())
          }
          val (vShape, vB, vE) = tensor(vecCol, "F32")
          val (iShape, iB, iE) = tensor(idCol, "I64")
          val n = iShape.head
          val dim = if (vShape.length == 2) vShape(1).toInt
            else throw new IllegalArgumentException(
              s"$file: $vecCol must be rank 2, got ${vShape.length}")
          if (vShape.head != n)
            throw new IllegalArgumentException(
              s"$file: tensor row counts differ ($n vs ${vShape.head})")
          if (vE - vB != 4L * n * dim || iE - iB != 8L * n)
            throw new IllegalArgumentException(
              s"$file: data_offsets disagree with shapes")
          // a single in-memory tensor slice caps at one JVM array —
          // reject beyond-2GiB tensors LOUDLY (an Int truncation here
          // would either crash confusingly or, worse, silently slice
          // the wrong bytes and desynchronize ids from vectors);
          // writers control this via rows-per-partition
          for ((nm, len) <- Seq((vecCol, vE - vB), (idCol, iE - iB)))
            if (len > Int.MaxValue - 8)
              throw new IllegalArgumentException(
                s"$file: tensor $nm is $len bytes — beyond one JVM " +
                  "array; re-shard with fewer rows per partition")
          // this writer lays vectors first; a foreign file may not —
          // stream in offset order, holding only the earlier tensor.
          // skipBytes may skip LESS than asked (buffered stream
          // boundary) — loop it, and treat EOF mid-skip as truncation
          def skipFully(k: Long): Unit = {
            var left = k
            while (left > 0) {
              val s = in.skipBytes(math.min(left, Int.MaxValue.toLong).toInt)
              if (s <= 0) throw new EOFException(s"skip stalled at $left")
              left -= s
            }
          }
          skipFully(math.min(vB, iB))
          def readBytes(k: Long): Array[Byte] = {
            val a = new Array[Byte](k.toInt); in.readFully(a); a
          }
          val (vBytes, iBytes) =
            if (vB <= iB) { val v = readBytes(vE - vB)
              skipFully(iB - vE); (v, readBytes(iE - iB)) }
            else { val i = readBytes(iE - iB)
              skipFully(vB - iE); (readBytes(vE - vB), i) }
          val vv = ByteBuffer.wrap(vBytes).order(ByteOrder.LITTLE_ENDIAN)
          val iv = ByteBuffer.wrap(iBytes).order(ByteOrder.LITTLE_ENDIAN)
          (0L until n).iterator.map { r =>
            val vec = new Array[Float](dim)
            var j = 0
            while (j < dim) { vec(j) = vv.getFloat((r.toInt * dim + j) * 4); j += 1 }
            (iv.getLong(r.toInt * 8), vec.toSeq)
          } ++ { in.close(); Iterator.empty }
        } catch { case e: EOFException =>
          in.close()
          throw new IllegalArgumentException(
            s"$file: truncated safetensors file", e)
        }
      }
      .toDF(idCol, vecCol)
  }
}
