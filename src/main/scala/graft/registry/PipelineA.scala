package graft.registry

import graft.fixtures.RefFixtures
import graft.views.SuperDesconto
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness registration for Pipeline A ("super desconto",
  * reference `utils_superdesconto.py` + `etl_job.py:28-68`).
  *
  * Each entry pairs the Spark view (over [[RefFixtures]] bindings of the
  * star-schema testdata) with byte-equivalent DuckDB SQL over the same
  * parquet files. Column names/aliases match exactly on both sides — the
  * driver's compare sorts columns by name before hashing.
  */
object PipelineA {
  import RefFixtures.withClause

  // ---- Spark side --------------------------------------------------------

  def preVendaDf(s: SparkSession, dir: String): DataFrame =
    SuperDesconto.preVenda(RefFixtures.cosmos.df(s, dir), SuperDesconto.colsCosmos)

  def cupomDf(s: SparkSession, dir: String): DataFrame =
    SuperDesconto.cupom(RefFixtures.cosmos.df(s, dir), RefFixtures.preVenda.df(s, dir))

  def autorizadorDf(s: SparkSession, dir: String): DataFrame =
    SuperDesconto.autorizador(RefFixtures.autorizacao.df(s, dir))

  def produtoDf(s: SparkSession, dir: String): DataFrame =
    SuperDesconto.produto(RefFixtures.produto.df(s, dir))

  def flagshipDf(s: SparkSession, dir: String): DataFrame =
    SuperDesconto.flagship(cupomDf(s, dir), autorizadorDf(s, dir), produtoDf(s, dir))

  // ---- DuckDB oracle CTEs ------------------------------------------------
  // The same total-order tie-breakers as the Spark windows (Dedup.top1PerKey
  // callers in SuperDesconto) so the argmax is deterministic in both engines.

  /** Canonical POS union (C6+O2): both feeds projected, etiqueta-padded,
    * renamed to the shared 7-column schema. */
  private val canonCte: String =
    """canon AS (
      |SELECT MVVC_CD_FILIAL_MOV AS filial, MVVP_NR_PRD AS cod_prod, MVVC_DT_MOV AS periodo, CAST(lpad(trim(NUMERO_AUTORIZ_PAGUEMENOS), 30, '0') AS STRING) AS etiqueta, MVVP_PR_DSC_ITE AS perc_dsc_cupom, MVVP_VL_PRE_VDA AS venda, MVVP_VL_PRD_VEN AS venda_desconto FROM cosmos
      |UNION ALL
      |SELECT VC_CD_FILIAL, VD_CD_PRODUTO, VC_DH_VENDA, CAST(lpad(trim(VD_COD_ETIQUETA_ULCH), 30, '0') AS STRING), VD_PERC_DESCONTO, VD_VL_PRODUTO, VD_VL_PRODUTO_COM_DESCONTO FROM pre_venda
      |)""".stripMargin

  /** C7 view_cupom: top-discount sale per coupon label. */
  private val cupomCte: String =
    """cupom AS (
      |SELECT filial, cod_prod, periodo, etiqueta, perc_dsc_cupom, venda, venda_desconto FROM (
      |  SELECT c.*, row_number() OVER (PARTITION BY etiqueta ORDER BY venda_desconto DESC NULLS LAST, venda DESC NULLS LAST, periodo DESC NULLS LAST, filial ASC NULLS FIRST, cod_prod ASC NULLS FIRST, perc_dsc_cupom ASC NULLS FIRST) AS rn FROM canon c
      |) r WHERE rn = 1)""".stripMargin

  /** C8 view_autorizador: finalized auths, one per barcode (lowest id). */
  private val autCte: String =
    """aut AS (
      |SELECT ulch_sq_autorizacao, ulch_preco_venda, ulch_percentual_desconto, ulch_fl_tipo_produto, ulch_cd_barras, ulch_fl_situacao, ulch_sq_produto FROM (
      |  SELECT p.*, row_number() OVER (PARTITION BY ulch_cd_barras ORDER BY ulch_sq_autorizacao ASC NULLS FIRST) AS rn FROM (
      |    SELECT ulch_sq_autorizacao, ulch_preco_venda, COALESCE(ulch_percentual_desconto, 0) AS ulch_percentual_desconto, ulch_fl_tipo_produto, CAST(lpad(trim(ulch_cd_barras), 30, '0') AS STRING) AS ulch_cd_barras, ulch_fl_situacao, ulch_sq_produto FROM autorizacao WHERE ulch_fl_situacao = 'F'
      |  ) p
      |) r WHERE rn = 1)""".stripMargin

  /** C9 view_produto: normalized lote, one row per product id (latest). */
  private val proCte: String =
    """pro AS (
      |SELECT ulch_sq_produto, xxxx_dh_cad, ulch_lote, ulch_dt_vencimento FROM (
      |  SELECT p.*, row_number() OVER (PARTITION BY ulch_sq_produto ORDER BY xxxx_dh_cad DESC NULLS LAST, ulch_lote DESC NULLS LAST, ulch_dt_vencimento DESC NULLS LAST) AS rn FROM (
      |    SELECT ulch_sq_produto, xxxx_dh_cad, upper(trim(ulch_lote)) AS ulch_lote, ulch_dt_vencimento FROM produto
      |  ) p
      |) r WHERE rn = 1)""".stripMargin

  // ---- Registration ------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_pre_venda" -> (preVendaDf _),
    "a_cupom" -> (cupomDf _),
    "a_autorizador" -> (autorizadorDf _),
    "a_produto" -> (produtoDf _),
    "a_flagship" -> (flagshipDf _))

  def oracleSql: Map[String, String] = Map(
    "a_pre_venda" ->
      (withClause("cosmos") +
        "\nSELECT MVVC_CD_FILIAL_MOV AS filial, MVVP_NR_PRD AS cod_prod, MVVC_DT_MOV AS periodo, CAST(lpad(trim(NUMERO_AUTORIZ_PAGUEMENOS), 30, '0') AS STRING) AS etiqueta, MVVP_PR_DSC_ITE AS perc_dsc_cupom, MVVP_VL_PRE_VDA AS venda, MVVP_VL_PRD_VEN AS venda_desconto FROM cosmos"),
    "a_cupom" ->
      (withClause("cosmos", "pre_venda") + s",\n$canonCte,\n$cupomCte\nSELECT * FROM cupom"),
    "a_autorizador" ->
      (withClause("autorizacao") + s",\n$autCte\nSELECT * FROM aut"),
    "a_produto" ->
      (withClause("produto") + s",\n$proCte\nSELECT * FROM pro"),
    "a_flagship" ->
      (withClause("cosmos", "pre_venda", "autorizacao", "produto") +
        s",\n$canonCte,\n$cupomCte,\n$autCte,\n$proCte\n" +
        """SELECT aut.ulch_sq_autorizacao, pro.ulch_sq_produto, pro.xxxx_dh_cad, cupom.periodo AS dt_venda, cupom.filial, cupom.cod_prod, pro.ulch_lote, pro.ulch_dt_vencimento, cupom.etiqueta, cupom.perc_dsc_cupom, cupom.venda, cupom.venda_desconto, aut.ulch_preco_venda, aut.ulch_percentual_desconto, aut.ulch_fl_tipo_produto
          |FROM cupom JOIN aut ON cupom.etiqueta = aut.ulch_cd_barras JOIN pro ON aut.ulch_sq_produto = pro.ulch_sq_produto""".stripMargin))
}
