package graft.fixtures

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Binds the reference's input tables (FIXTURES.md) onto the driver's
  * star-schema testdata, *deterministically and SQL-expressibly*: every
  * fixture is a pure projection/filter of one star table, written once as a
  * Spark expression and once as the byte-equivalent DuckDB expression, so
  * every pipeline query can be verified against a DuckDB oracle running on
  * the very same parquet files.
  *
  * Dialect notes (kept aligned by construction):
  *  - expressions are shared text unless timestamp arithmetic is involved
  *    (Spark `make_interval`/`TIMESTAMP_NTZ` vs DuckDB `INTERVAL (x) DAY`);
  *  - no bare decimal literals next to integers in DuckDB (would infer
  *    DECIMAL, not DOUBLE) — decimal literals only ever multiply doubles;
  *  - no `round()` anywhere: raw IEEE arithmetic is bit-identical across
  *    engines, rounding modes are not.
  */
object RefFixtures {

  /** One expression, rendered per dialect. */
  final case class Ex(spark: String, duck: String)
  object Ex { def same(s: String): Ex = Ex(s, s) }
  import Ex.same

  final case class FixtureDef(name: String, from: String, where: String, exprs: Seq[Ex]) {
    def df(spark: SparkSession, sfDir: String): DataFrame = {
      val base =
        if (from == "events") Tables.events(spark, sfDir)
        else Tables.table(spark, sfDir, from)
      val filtered = if (where.nonEmpty) base.where(where) else base
      filtered.selectExpr(exprs.map(_.spark): _*)
    }
    /** CTE body for the DuckDB oracle (driver registers star tables by name). */
    def duckCte: String = {
      val w = if (where.nonEmpty) s" WHERE $where" else ""
      s"$name AS (SELECT ${exprs.map(_.duck).mkString(", ")} FROM $from$w)"
    }
  }

  // ---- Pipeline A (super desconto) --------------------------------------

  /** POS feed 1 (reference cosmosmov; columns `utils_superdesconto.py:19-27`). */
  val cosmos = FixtureDef("cosmos", "events", "event_id % 2 = 0", Seq(
    same("cast(user_id % 100 as int) as MVVC_CD_FILIAL_MOV"),
    same("event_id % 1000 as MVVP_NR_PRD"),
    // Spark side reads via Tables.events (ns-long → µs TIMESTAMP_NTZ);
    // DuckDB sees raw parquet TIMESTAMP_NS — cast to µs explicitly so both
    // dialects are self-contained over the same files.
    Ex(spark = "ts as MVVC_DT_MOV",
       duck  = "CAST(ts AS TIMESTAMP) as MVVC_DT_MOV"),
    same("concat(' ', cast(event_id % 450 as string), ' ') as NUMERO_AUTORIZ_PAGUEMENOS"),
    same("value * 0.05 as MVVP_PR_DSC_ITE"),
    same("value as MVVP_VL_PRE_VDA"),
    same("value * 0.9 as MVVP_VL_PRD_VEN")))

  /** POS feed 2 (reference pre_venda; columns `utils_superdesconto.py:29-37`). */
  val preVenda = FixtureDef("pre_venda", "events", "event_id % 2 = 1", Seq(
    same("cast(user_id % 97 as int) as VC_CD_FILIAL"),
    same("event_id % 977 as VD_CD_PRODUTO"),
    Ex(spark = "ts as VC_DH_VENDA",
       duck  = "CAST(ts AS TIMESTAMP) as VC_DH_VENDA"),
    same("cast(event_id % 450 as string) as VD_COD_ETIQUETA_ULCH"),
    same("value * 0.04 as VD_PERC_DESCONTO"),
    same("value * 1.1 as VD_VL_PRODUTO"),
    same("value as VD_VL_PRODUTO_COM_DESCONTO")))

  /** Discount authorizations (reference `utils_superdesconto.py:39-47`).
    * Includes non-'F' rows (situacao filter) and NULL percentuals. */
  val autorizacao = FixtureDef("autorizacao", "part", "", Seq(
    same("p_partkey + 100000 as ulch_sq_autorizacao"),
    same("p_retailprice as ulch_preco_venda"),
    same("case when p_partkey % 7 = 0 then cast(null as double) else cast(p_size as double) end as ulch_percentual_desconto"),
    same("p_brand as ulch_fl_tipo_produto"),
    same("cast(p_partkey % 450 as string) as ulch_cd_barras"),
    same("case when p_partkey % 3 = 0 then 'F' else 'A' end as ulch_fl_situacao"),
    same("p_partkey as ulch_sq_produto")))

  /** Product registry with duplicate keys + mixed-case/whitespace lotes
    * (reference `utils_superdesconto.py:49-55`). */
  val produto = FixtureDef("produto", "lineitem", "", Seq(
    same("l_partkey as ulch_sq_produto"),
    same("l_shipdate as xxxx_dh_cad"),
    same("concat('  lote ', l_returnflag, ' ', cast(l_linenumber as string), '  ') as ulch_lote"),
    same("l_shipdate + INTERVAL 90 DAY as ulch_dt_vencimento")))

  // ---- Pipeline B (ressarcimento) ---------------------------------------

  /** Supplier master: accents, multi-space, the dropped `Ž`, punctuated
    * CNPJs, nullable SAP master (reference reads `utils_ressarcimento.py:28`). */
  val fornecedor = FixtureDef("fornecedor", "supplier", "", Seq(
    same("s_suppkey as forn_cd_fornecedor"),
    same("case when s_suppkey % 2 = 0 then concat(' Žélia  ', s_name, '  áçaí ') else concat('  ', s_name, ' Çôrp  ümlaut ') end as forn_nm_fantasia"),
    same("concat(cast(s_suppkey as string), '.', cast(s_suppkey % 100 as string), '/0001-', cast(s_suppkey % 10 as string)) as forn_tn_cnpj"),
    same("case when s_suppkey % 3 = 0 then s_suppkey % 7 else cast(null as bigint) end as fsma_codigo_sap_master"),
    Ex(spark = "TIMESTAMP_NTZ'2023-01-01 00:00:00' + make_interval(0, 0, 0, cast(s_suppkey as int)) as xxxx_dh_cad",
       duck  = "TIMESTAMP '2023-01-01 00:00:00' + INTERVAL (s_suppkey) DAY as xxxx_dh_cad")))

  /** Parent-supplier group header (duplicate children across groups, distinct
    * timestamps → exercises the latest-parent argmax, `utils_ressarcimento.py:52-55`). */
  val aporteCab = FixtureDef("aporte_cab", "supplier", "", Seq(
    same("s_suppkey as id_grupo_fornecedores_aporte_cab"),
    same("s_suppkey % 5 as codigo_fornecedor_principal"),
    Ex(spark = "TIMESTAMP_NTZ'2023-06-01 00:00:00' + make_interval(0, 0, 0, cast((s_suppkey * 13) % 40 as int)) as data_hora_cadastro",
       duck  = "TIMESTAMP '2023-06-01 00:00:00' + INTERVAL ((s_suppkey * 13) % 40) DAY as data_hora_cadastro")))

  /** Parent-supplier group detail (children). */
  val aporteDet = FixtureDef("aporte_det", "nation", "", Seq(
    same("cast(n_nationkey % 10 as bigint) as id_grupo_fornecedores_aporte_cab"),
    same("cast(n_nationkey % 7 as bigint) as codigo_fornecedor")))

  /** Wide product dim — only the columns the reference declares
    * (`utils_ressarcimento.py:33-41,198-207`); NULLs + `<= 0` keys included. */
  val dimProduto = FixtureDef("dim_produto", "part", "", Seq(
    same("p_partkey as codigo_produto"),
    same("case when p_partkey % 11 = 0 then cast(null as string) else concat('Pródutô  ', p_name) end as nome_produto"),
    same("case when p_partkey % 7 = 0 then cast(null as string) else concat('Forn çom  ', cast(p_partkey % 8 as string)) end as fornecedor_comercial"),
    same("case when p_partkey % 13 = 0 then cast(0 as bigint) else p_partkey % 10 end as codigo_fornecedor_principal_deposito")))

  /** Losses: collection header (timestamps spread over years 1995-2001). */
  val coletaCab = FixtureDef("coleta_cab", "orders", "", Seq(
    same("o_orderkey as id_recuperavel_coleta_cab"),
    Ex(spark = "o_orderdate + make_interval(0, 0, 0, 0, cast(o_orderkey % 23 as int)) as rcca_dh_cadastro",
       duck  = "o_orderdate + INTERVAL (o_orderkey % 23) HOUR as rcca_dh_cadastro")))

  /** Losses: collection detail (NULL discounts, depots both sides of 5).
    * Measures are integer-valued doubles (floor): the summed `perdas` is then
    * exactly representable, so the float aggregate is order-independent and
    * hash-comparable across Spark's partial/final merge order vs DuckDB's.
    * (l_quantity is integer-valued in the testdata already.) */
  val coletaDet = FixtureDef("coleta_det", "lineitem", "", Seq(
    same("l_orderkey as id_recuperavel_coleta_cab"),
    same("cast(l_linenumber % 5 as bigint) as id_recuperavel_tipo_volume"),
    same("l_quantity as rcde_qt_produto"),
    same("cast(floor(l_extendedprice) as double) as rcde_vl_produto"),
    same("case when l_discount < 0.03 then cast(null as double) else cast(floor(l_extendedprice * l_discount) as double) end as rcde_vl_desconto"),
    same("cast(l_suppkey % 12 as int) as rcde_cd_deposito"),
    same("l_suppkey % 10 as rcde_cd_fornecedor_entrada"),
    same("l_partkey as rcde_cd_produto")))

  /** Loss event types (accented descriptions). */
  val volumeTipo = FixtureDef("volume_tipo", "region", "", Seq(
    same("cast(r_regionkey as bigint) as id_recuperavel_tipo_volume"),
    same("concat('Evênto  çoleta ', r_name) as rtv_desc_descricao")))

  /** Negotiations (destino ids in and out of the reference's constant list,
    * nullable codigo_empresa — `utils_ressarcimento.py:135,157,160`). */
  val negociacao = FixtureDef("negociacao", "orders", "", Seq(
    same("o_orderkey as id_negociacao_aporte"),
    same("cast(case o_orderkey % 10 when 0 then 127 when 1 then 219 when 2 then 44 when 3 then 7 when 4 then 112 when 5 then 106 when 6 then 282 else 900 end as bigint) as id_destino_negociacao"),
    same("o_custkey % 10 as codigo_fornecedor"),
    same("case when o_orderkey % 4 = 0 then cast(null as int) else cast(o_orderkey % 3 as int) end as codigo_empresa")))

  val debito = FixtureDef("debito", "orders", "", Seq(
    same("o_orderkey as id_negociacao_aporte"),
    same("o_orderkey * 2 as id_debito_fornecedor")))

  val pagamento = FixtureDef("pagamento", "orders", "", Seq(
    same("o_orderkey * 2 as id_debito_fornecedor"),
    Ex(spark = "o_orderdate + make_interval(0, 0, 0, 0, cast(o_orderkey % 11 as int)) as data_hora_cadastro",
       duck  = "o_orderdate + INTERVAL (o_orderkey % 11) HOUR as data_hora_cadastro"),
    same("cast(floor(o_totalprice * 0.01) as double) as valor")))

  /** SAP credit feed (flag_credito 0/1, PM/EF, joins fsma_codigo_sap_master). */
  val dimSap = FixtureDef("dim_sap", "orders", "o_orderkey % 5 = 0", Seq(
    same("o_custkey % 7 as fornecedor_principal_sap"),
    same("cast(o_orderkey % 2 as int) as flag_credito"),
    same("o_orderdate as data_credito"),
    same("case when o_custkey % 2 = 0 then 'PM' else 'EF' end as flag_empresa"),
    same("cast(floor(o_totalprice * 0.005) as double) as montante")))

  val all: Seq[FixtureDef] = Seq(
    cosmos, preVenda, autorizacao, produto,
    fornecedor, aporteCab, aporteDet, dimProduto,
    coletaCab, coletaDet, volumeTipo,
    negociacao, debito, pagamento, dimSap)

  def byName(name: String): FixtureDef = all.find(_.name == name).get

  /** Render the `WITH` prefix for a DuckDB oracle over these fixtures
    * (callers may append further CTEs before the final SELECT). */
  def withClause(names: String*): String =
    names.map(byName(_).duckCte).mkString("WITH ", ",\n", "")
}
