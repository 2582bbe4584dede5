"""table_computing_spark — a PySpark-native analytics engine with the
query surface of alibaba/table-computing (reference: /root/reference).

The reference is a single-module Java stream-processing library whose
"expression language" is 8 single-method UDF interfaces over a columnar
`Table` (reference src/main/java/com/alibaba/tc/table/Table.java). This
package re-expresses that operator surface — plus the large-scale
training-data-pipeline operators a modern 100 TB corpus needs — as a thin,
typed layer over the Spark DataFrame / SQL / Structured Streaming APIs, so
Catalyst + Tungsten own optimization and physical execution.

Public surface:
  Table                — relational operator wrapper  (ref: table/Table.java)
  Type, schema_of      — 5-type lattice               (ref: table/Type.java)
  functions.*          — scalar/date/agg library      (ref: util/*.java)
  operators.windows    — batch OVER + time windows    (ref: window/*.java)
  operators.dedup      — exact/minhash/simhash/jaccard/embedding dedup,
                         cross-corpus incremental dedup
  operators.similarity — brute-force + LSH/IVF ANN, JL projection,
                         int8 quantization
  operators.text       — lang-id, quality (incl. Gopher rules), tokens,
                         fingerprints, decontamination, span dedup,
                         unigram-LM NLL, domain mixture plan/apply
  operators.classify   — multinomial Naive Bayes train + score
  operators.multimodal — PPM/BMP/PNG/WAV codecs, resize, frame sampling
  sources.*            — parquet/JDBC/Kafka/memory    (ref: sp/input, sp/output)
  streaming.*          — watermark/windows/dimension  (ref: window/, sp/dimension)
"""

from table_computing_spark.schema import ColumnTypeBuilder, Type
from table_computing_spark.session import get_spark
from table_computing_spark.table import Table

__all__ = ["Table", "Type", "ColumnTypeBuilder", "get_spark"]
__version__ = "0.1.0"
