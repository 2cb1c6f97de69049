package graft.sources

/** Foreign-shape Arrow IPC fixture writer: one `.arrow` file with a
  * DICTIONARY-ENCODED string column (the dictionary rides a dictionary
  * batch) and optionally zstd/lz4-compressed record-batch bodies — the
  * two shapes pyarrow emits routinely (`dictionary=True` pandas
  * categoricals, `compression=`) that this engine's own sink never
  * writes. Exists so gates and specs can generate REAL foreign files
  * through arrow-java without a Python runtime; the graftarrow READER
  * is the product surface under test (dictionary columns decode to
  * their value type, compressed bodies inflate transparently).
  *
  * Driver-side by design: fixture generation, not a data path — the
  * row set is the caller's bounded sample. */
object ArrowForeign {
  def write(dir: String, rows: Seq[(Long, String)],
            codec: Option[org.apache.arrow.vector.compression
              .CompressionUtil.CodecType],
            batches: Int = 2): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.dictionary.{Dictionary,
      DictionaryEncoder, DictionaryProvider}
    import org.apache.arrow.memory.RootAllocator
    import scala.jdk.CollectionConverters._
    val alloc = new RootAllocator()
    try {
      // dictionary: the distinct source values
      val values = rows.map(_._2).distinct.sorted
      val dictVec = new VarCharVector("source_dict", alloc)
      dictVec.allocateNew()
      values.zipWithIndex.foreach { case (v, i) =>
        dictVec.setSafe(i, v.getBytes("UTF-8")) }
      dictVec.setValueCount(values.length)
      val enc = new org.apache.arrow.vector.types.pojo.DictionaryEncoding(
        7L, false, new ArrowType.Int(32, true))
      val dict = new Dictionary(dictVec, enc)
      val provider = new DictionaryProvider.MapDictionaryProvider(dict)
      val idVec = new BigIntVector("doc_id", alloc)
      val raw = new VarCharVector("source", alloc)
      val per = (rows.length + batches - 1) / math.max(batches, 1)
      val groups = rows.grouped(math.max(per, 1)).toSeq
      raw.allocateNew()
      val file = new java.io.File(dir, "foreign.arrow")
      var writer: org.apache.arrow.vector.ipc.ArrowFileWriter = null
      var root: VectorSchemaRoot = null
      val ch = new java.io.FileOutputStream(file).getChannel
      try {
        groups.foreach { g =>
          raw.reset(); raw.allocateNew()
          g.zipWithIndex.foreach { case ((_, sv), i) =>
            raw.setSafe(i, sv.getBytes("UTF-8")) }
          raw.setValueCount(g.length)
          // encode discovers the index-vector field shape on first use
          val encoded = DictionaryEncoder.encode(raw, dict)
            .asInstanceOf[IntVector]
          try {
            if (root == null) {
              val idField = new Field("doc_id",
                FieldType.nullable(new ArrowType.Int(64, true)), null)
              val encField = encoded.getField
              root = new VectorSchemaRoot(
                Seq(idField, encField).asJava,
                Seq[FieldVector](idVec, new IntVector(encField, alloc)).asJava)
              writer = codec match {
                case Some(ct) => new org.apache.arrow.vector.ipc
                  .ArrowFileWriter(root, provider, ch,
                    new java.util.HashMap[String, String](),
                    org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
                    org.apache.arrow.compression
                      .CommonsCompressionFactory.INSTANCE, ct)
                case None => new org.apache.arrow.vector.ipc
                  .ArrowFileWriter(root, provider, ch)
              }
              writer.start()
            }
            idVec.reset(); idVec.allocateNew()
            g.zipWithIndex.foreach { case ((id, _), i) =>
              idVec.setSafe(i, id) }
            idVec.setValueCount(g.length)
            val target = root.getVector(1).asInstanceOf[IntVector]
            target.reset(); target.allocateNew()
            (0 until encoded.getValueCount).foreach { i =>
              if (!encoded.isNull(i)) target.setSafe(i, encoded.get(i)) }
            target.setValueCount(encoded.getValueCount)
            root.setRowCount(g.length)
            writer.writeBatch()
          } finally encoded.close()
        }
        writer.end()
      } finally {
        if (writer != null) writer.close()
        ch.close()
        if (root != null) root.close()
        raw.close()
        dictVec.close()
      }
    } finally alloc.close()
  }
}
