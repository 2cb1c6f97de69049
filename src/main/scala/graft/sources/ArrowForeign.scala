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
    // a fixture generator refuses loudly on nothing-to-write (the
    // writer/root below would otherwise NPE at writer.end())
    require(rows.nonEmpty, "ArrowForeign.write: empty rows")
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

  /** NESTED dictionary shapes (what pyarrow writes for a categorical
    * inside a struct, or a list of categoricals): one `.arrow` file
    * with `doc_id: int64`, `meta: struct<source: dict<int32→utf8>,
    * rank: int64>`, and `tags: list<dict<int32→utf8>>` — two distinct
    * dictionaries (ids 9, 10) riding dictionary batches. Exercises the
    * reader's recursive decode (composite wrappers). */
  def writeNested(dir: String,
                  rows: Seq[(Long, String, Long, Seq[String])]): Unit = {
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.complex.{ListVector, StructVector}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType,
      Schema, DictionaryEncoding}
    import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
    import org.apache.arrow.memory.RootAllocator
    import scala.jdk.CollectionConverters._
    require(rows.nonEmpty, "ArrowForeign.writeNested: empty rows")
    val alloc = new RootAllocator()
    try {
      val srcValues = rows.map(_._2).distinct.sorted
      val tagValues = rows.flatMap(_._4).distinct.sorted
      val srcIdx = srcValues.zipWithIndex.toMap
      val tagIdx = tagValues.zipWithIndex.toMap
      val srcDictVec = new VarCharVector("src_dict", alloc)
      srcDictVec.allocateNew()
      srcValues.zipWithIndex.foreach { case (v, i) =>
        srcDictVec.setSafe(i, v.getBytes("UTF-8")) }
      srcDictVec.setValueCount(srcValues.length)
      val tagDictVec = new VarCharVector("tag_dict", alloc)
      tagDictVec.allocateNew()
      tagValues.zipWithIndex.foreach { case (v, i) =>
        tagDictVec.setSafe(i, v.getBytes("UTF-8")) }
      tagDictVec.setValueCount(tagValues.length)
      val encSrc = new DictionaryEncoding(9L, false,
        new ArrowType.Int(32, true))
      val encTag = new DictionaryEncoding(10L, false,
        new ArrowType.Int(32, true))
      val provider = new DictionaryProvider.MapDictionaryProvider(
        new Dictionary(srcDictVec, encSrc), new Dictionary(tagDictVec, encTag))
      val schema = new Schema(Seq(
        new Field("doc_id",
          FieldType.nullable(new ArrowType.Int(64, true)), null),
        new Field("meta", FieldType.nullable(ArrowType.Struct.INSTANCE), Seq(
          new Field("source",
            new FieldType(true, new ArrowType.Int(32, true), encSrc), null),
          new Field("rank",
            FieldType.nullable(new ArrowType.Int(64, true)), null)).asJava),
        new Field("tags", FieldType.nullable(new ArrowType.List()), Seq(
          new Field("item",
            new FieldType(true, new ArrowType.Int(32, true), encTag),
            null)).asJava)).asJava)
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val id = root.getVector("doc_id").asInstanceOf[BigIntVector]
        val meta = root.getVector("meta").asInstanceOf[StructVector]
        val srcV = meta.getChild("source").asInstanceOf[IntVector]
        val rankV = meta.getChild("rank").asInstanceOf[BigIntVector]
        val tags = root.getVector("tags").asInstanceOf[ListVector]
        val tagData = tags.getDataVector.asInstanceOf[IntVector]
        var off = 0
        rows.zipWithIndex.foreach { case ((d, sv, rk, tg), i) =>
          id.setSafe(i, d)
          meta.setIndexDefined(i)
          srcV.setSafe(i, srcIdx(sv))
          rankV.setSafe(i, rk)
          tags.startNewValue(i): Unit
          tg.foreach { t => tagData.setSafe(off, tagIdx(t)); off += 1 }
          tags.endValue(i, tg.length)
        }
        root.setRowCount(rows.length)
        val file = new java.io.File(dir, "foreign_nested.arrow")
        val ch = new java.io.FileOutputStream(file).getChannel
        val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(
          root, provider, ch)
        try { writer.start(); writer.writeBatch(); writer.end() }
        finally { writer.close(); ch.close() }
      } finally {
        root.close(); srcDictVec.close(); tagDictVec.close()
      }
    } finally alloc.close()
  }
}
