"""Builder functions wiring registry names to model classes.

Extended as each family lands; common params are filled from DataInfo so a
config only needs to override what differs.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from tpurec.data.schema import DataInfo
from tpurec.models import dcn as dcn_models
from tpurec.models import din as din_models
from tpurec.models import dmr as dmr_models
from tpurec.models import fibinetpp as fpp_models
from tpurec.models import poso as poso_models
from tpurec.models import fm as fm_models
from tpurec.models import mind as mind_models
from tpurec.models import multitask as mt_models
from tpurec.models import sim as sim_models
from tpurec.models import matrixcf as cf_models
from tpurec.models.registry import register_model


def _common(params: dict, info: DataInfo) -> dict:
    out = dict(params)
    out.setdefault("feature_names", list(info.feature_names))
    out.setdefault("vocab_size", info.total_dims)
    return out


def _with_continuous(params: dict, info: DataInfo) -> dict:
    out = _common(params, info)
    out.setdefault("continuous_names", list(info.continuous_names))
    return out


@register_model("matrixcf")
def _matrixcf(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    p = dict(params)
    p.pop("embed_dim", None) if "embed_dim" not in params else None
    p.setdefault("vocab_size", info.total_dims)
    return cf_models.MatrixCF(mesh=mesh, **p)


@register_model("ncf")
def _ncf(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    p = dict(params)
    p.pop("embed_dim", None)
    p.setdefault("vocab_size", info.total_dims)
    return cf_models.NCF(mesh=mesh, **p)


@register_model("fm")
def _fm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.FM(mesh=mesh, **_common(params, info))


@register_model("dssm_single")
def _dssm_single(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.DSSMSingleRanking(mesh=mesh, **_common(params, info))


@register_model("dssm_double")
def _dssm_double(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    p = dict(params)
    p.setdefault("user_features", list(info.user_features or info.feature_names[:2]))
    p.setdefault("item_features", list(info.item_features or info.feature_names[2:]))
    p.setdefault("vocab_size", info.total_dims)
    return fm_models.DSSMTwoTowerRetrieval(mesh=mesh, **p)


@register_model("deepfm")
def _deepfm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.DeepFM(mesh=mesh, **_common(params, info))


@register_model("wide_and_deep")
def _wide_and_deep(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    p = _common(params, info)
    p.setdefault("continuous_names", list(info.continuous_names))
    return fm_models.WideAndDeep(mesh=mesh, **p)


@register_model("ffm")
def _ffm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.FFM(mesh=mesh, **_common(params, info))


@register_model("fwfm")
def _fwfm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.FwFM(mesh=mesh, **_common(params, info))


@register_model("pnn")
def _pnn(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.PNN(mesh=mesh, **_common(params, info))


@register_model("onn")
def _onn(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fm_models.ONN(mesh=mesh, **_common(params, info))


# ----------------------------------------------------------------- DCN family
@register_model("dcn")
def _dcn(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.DCN(mesh=mesh, **_with_continuous(params, info))


@register_model("xdeepfm")
def _xdeepfm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.XDeepFM(mesh=mesh, **_with_continuous(params, info))


@register_model("nfm")
def _nfm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.NFM(mesh=mesh, **_with_continuous(params, info))


@register_model("deep_crossing")
def _deep_crossing(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.DeepCrossing(mesh=mesh, **_with_continuous(params, info))


@register_model("fnn")
def _fnn(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.FNN(mesh=mesh, **_with_continuous(params, info))


@register_model("ccpm")
def _ccpm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.CCPMModel(mesh=mesh, **_with_continuous(params, info))


@register_model("fgcnn")
def _fgcnn(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.FGCNNModel(mesh=mesh, **_with_continuous(params, info))


@register_model("afm")
def _afm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.AFM(mesh=mesh, **_with_continuous(params, info))


@register_model("fibinet")
def _fibinet(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.FiBiNet(mesh=mesh, **_with_continuous(params, info))


@register_model("autoint")
def _autoint(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dcn_models.AutoInt(mesh=mesh, **_with_continuous(params, info))


# ----------------------------------------------------------- multi-task stack
@register_model("mmoe")
def _mmoe(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mt_models.MMOE(mesh=mesh, **_with_continuous(params, info))


@register_model("esmm")
def _esmm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mt_models.ESMM(mesh=mesh, **_with_continuous(params, info))


@register_model("ple")
def _ple(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mt_models.PLE(mesh=mesh, **_with_continuous(params, info))


@register_model("esm2")
def _esm2(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mt_models.ESM2(mesh=mesh, **_with_continuous(params, info))


@register_model("escm2")
def _escm2(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mt_models.ESCM2(mesh=mesh, **_with_continuous(params, info))


@register_model("fdn")
def _fdn(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mt_models.FDN(mesh=mesh, **_with_continuous(params, info))


# ------------------------------------------------------------- sequence stack
def _seq_params(params: dict, info: DataInfo) -> dict:
    out = dict(params)
    out.setdefault("user_features", list(info.user_features))
    out.setdefault("item_features", list(info.item_features))
    out.setdefault("sequence_features", list(info.sequence_names))
    if info.sequence_query_features:
        out.setdefault("query_features", list(info.sequence_query_features))
    out.setdefault("vocab_size", info.total_dims)
    out.setdefault("padding_index", info.padding_index)
    return out


@register_model("din")
def _din(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return din_models.DIN(mesh=mesh, **_seq_params(params, info))


@register_model("dien")
def _dien(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return din_models.DIEN(mesh=mesh, **_seq_params(params, info))


@register_model("dsin")
def _dsin(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return din_models.DSIN(mesh=mesh, **_seq_params(params, info))


# --------------------------------------------------- multi-interest retrieval
def _retrieval_params(params: dict, info: DataInfo) -> dict:
    out = dict(params)
    out.setdefault("user_features", list(info.user_features))
    out.setdefault("sequence_features", list(info.sequence_names))
    if info.sequence_query_features:
        out.setdefault("query_features", list(info.sequence_query_features))
    out.setdefault("vocab_size", info.total_dims)
    out.setdefault("padding_index", info.padding_index)
    # per-feature sampling ranges for sampled-softmax negatives: a negative
    # candidate's j-th id must come from the j-th query feature's offset
    # range in the shared id space (mind._RetrievalBase._sampled_logits)
    if "query_feature_ranges" not in out:
        span = dict(
            zip(info.feature_names, zip(info.feature_offsets, info.feature_dims))
        )
        ranges = []
        for q in out.get("query_features", ("item_id",)):
            if q in span:
                off, dim = span[q]
                ranges.append((int(off), int(off) + int(dim)))
            else:
                ranges.append((1, info.total_dims))
        out["query_feature_ranges"] = tuple(ranges)
    return out


@register_model("mind")
def _mind(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mind_models.MIND(mesh=mesh, **_retrieval_params(params, info))


@register_model("sdm")
def _sdm(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mind_models.SDM(mesh=mesh, **_retrieval_params(params, info))


@register_model("comirec")
def _comirec(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mind_models.ComiRec(mesh=mesh, **_retrieval_params(params, info))


@register_model("sine")
def _sine(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return mind_models.SINE(mesh=mesh, **_retrieval_params(params, info))


# ------------------------------------------------------ long-sequence ranking
@register_model("sim")
def _sim(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return sim_models.SIM(mesh=mesh, **_seq_params(params, info))


@register_model("can")
def _can(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return sim_models.CAN(mesh=mesh, **_seq_params(params, info))


@register_model("eta")
def _eta(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return sim_models.ETA(mesh=mesh, **_seq_params(params, info))


# ----------------------------------------------------------------- DMR family
@register_model("dmr")
def _dmr(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dmr_models.DMR(mesh=mesh, **_seq_params(params, info))


@register_model("dmt")
def _dmt(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dmr_models.DMT(mesh=mesh, **_seq_params(params, info))


@register_model("finalmlp")
def _finalmlp(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dmr_models.FinalMLP(mesh=mesh, **_common(params, info))


@register_model("sdim")
def _sdim(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return dmr_models.SDIM(mesh=mesh, **_seq_params(params, info))


# -------------------------------------------------- personalization gates (10)
@register_model("poso_mlp")
def _poso_mlp(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return poso_models.PosoMLPModel(mesh=mesh, **_common(params, info))


@register_model("poso_mha")
def _poso_mha(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return poso_models.PosoMHAModel(mesh=mesh, **_common(params, info))


@register_model("poso_mmoe")
def _poso_mmoe(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return poso_models.PosoMMOEModel(mesh=mesh, **_common(params, info))


@register_model("pepnet")
def _pepnet(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return poso_models.PEPNet(mesh=mesh, **_common(params, info))


# --------------------------------------------------------------- FiBiNet++ (11)
@register_model("fibinet_pp")
def _fibinet_pp(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fpp_models.FiBiNetPlusPlus(mesh=mesh, **_with_continuous(params, info))


@register_model("masknet")
def _masknet(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fpp_models.MaskNet(mesh=mesh, **_with_continuous(params, info))


@register_model("contextnet")
def _contextnet(params: dict, info: DataInfo, mesh: Optional[Mesh]):
    return fpp_models.ContextNet(mesh=mesh, **_with_continuous(params, info))
