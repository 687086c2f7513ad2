package graft.sources

import graft.views.Ressarcimento
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S2 + S4: config-driven production bindings — every source path comes from
  * a flat `Map[String, String]` (the reference loads `.env`,
  * `etl_job.py:128`), and the wide `dim_produto` dim is read with a declared
  * schema (manual pruning + type pinning + no footer inference, reference
  * `utils_ressarcimento.py:33-41,198-207`).
  */
object ConfigSources {

  /** The union of the two declared dim_produto column sets the reference
    * reads (2-col at `:33-41`, 3-col at `:198-207`). Declared once: the scan
    * reads only these columns regardless of how wide the dim is. */
  val DimProdutoSchema: StructType = StructType(Seq(
    StructField("codigo_produto", LongType),
    StructField("nome_produto", StringType),
    StructField("fornecedor_comercial", StringType),
    StructField("codigo_fornecedor_principal_deposito", LongType)))

  /** S2: declared-schema parquet scan. */
  def withSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** Bind all Pipeline B sources from config keys (same key names as the
    * reference's `.env`). */
  def ressarcimento(spark: SparkSession, config: Map[String, String]): Ressarcimento.Sources = {
    def rd(key: String): DataFrame = Tables.pathScan(spark, config(key))
    Ressarcimento.Sources(
      forn = rd("fornecedor"),
      aporteCab = rd("aporte_cab"),
      aporteDet = rd("aporte_det"),
      dimProduto = withSchema(spark, config("dim_produto"), DimProdutoSchema),
      coletaCab = rd("coleta_cab"),
      coletaDet = rd("coleta_det"),
      volumeTipo = rd("volume_tipo"),
      negociacao = rd("negociacao"),
      debito = rd("debito"),
      pagamento = rd("pagamento"),
      dimSap = rd("dim_sap"))
  }
}
