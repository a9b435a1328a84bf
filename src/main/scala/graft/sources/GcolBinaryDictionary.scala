package graft.sources

import org.apache.spark.sql.execution.vectorized.Dictionary

/** Binary (string) vector dictionary for dict-encoded gcol segments —
  * Spark's own `ColumnarDictionary` only ships numeric constructors, so
  * the string case implements the public `Dictionary` interface
  * directly. `WritableColumnVector.getUTF8String` reads through it
  * lazily: only rows actually consumed ever materialize their bytes,
  * the same laziness parquet's dictionary pages get.
  */
private[sources] final class GcolBinaryDictionary(values: Array[Array[Byte]])
    extends Dictionary {
  override def decodeToBinary(id: Int): Array[Byte] = values(id)
  override def decodeToInt(id: Int): Int =
    throw new UnsupportedOperationException("binary dictionary")
  override def decodeToLong(id: Int): Long =
    throw new UnsupportedOperationException("binary dictionary")
  override def decodeToFloat(id: Int): Float =
    throw new UnsupportedOperationException("binary dictionary")
  override def decodeToDouble(id: Int): Double =
    throw new UnsupportedOperationException("binary dictionary")
}
