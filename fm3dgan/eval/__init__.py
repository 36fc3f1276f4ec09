from fm3dgan.eval.fid import (
    calc_fid,
    compute_inception_stats,
    get_model_fid_score,
)
from fm3dgan.eval.quant_eval import (
    compute_face_identity_similarity,
    get_edit_score,
    get_recon_score,
)
from fm3dgan.eval.ppl import get_ppl_score

__all__ = [
    "calc_fid",
    "compute_inception_stats",
    "get_model_fid_score",
    "compute_face_identity_similarity",
    "get_edit_score",
    "get_recon_score",
    "get_ppl_score",
]
