"""Model factory (replaces reference src/util.py:61-96 string dispatch)."""
from __future__ import annotations

from easydgl_tpu.config import Config
from easydgl_tpu.models.base import SequentialModel
from easydgl_tpu.models.bert4rec import BERT4REC
from easydgl_tpu.models.ctsma import CTSMA
from easydgl_tpu.models.easydgl import EasyDGL
from easydgl_tpu.models.grec import GREC
from easydgl_tpu.models.gru4rec import GRU4REC
from easydgl_tpu.models.s2pnm import S2PNM
from easydgl_tpu.models.sasrec import SASREC
from easydgl_tpu.models.tgat import TGAT
from easydgl_tpu.models.tgrec import TGREC
from easydgl_tpu.models.timelyrec import TimelyREC
from easydgl_tpu.models.tisasrec import TiSASREC

MODELS = {
    "GRU4REC": GRU4REC,
    "SASREC": SASREC,
    "BERT4REC": BERT4REC,
    "GREC": GREC,
    "TGAT": TGAT,
    "TGREC": TGREC,
    "TiSASREC": TiSASREC,
    "TimelyREC": TimelyREC,
    "S2PNM": S2PNM,
    "CTSMA": CTSMA,
    "EasyDGL": EasyDGL,
}


def build_model(cfg: Config) -> SequentialModel:
    if cfg.model not in MODELS:
        raise NotImplementedError(
            f"The ranking model: {cfg.model} not implemented")
    cls = MODELS[cfg.model]
    if cfg.gather_queries:
        if not hasattr(cls, "gather_queries"):
            raise ValueError(
                f"cfg.gather_queries: {cfg.model} has no query-gather "
                "fast path (supported: EasyDGL)")
        return cls(cfg, gather_queries=True)
    return cls(cfg)
