"""Import reference task-model checkpoints (torch state_dicts) -> Flax params.

The reference saves whole pickled modules (torch.save(model),
nlp_classifier_train.py:158) or state_dicts (cv_classifier_train_daodian.py
:298). Unpickling whole modules requires the reference's code; their
``.state_dict()`` does not — so the supported interchange is: load the pickle
with the reference's classes importable, call ``state_dict()``, and feed the
dict (or a torch.load of a saved state_dict) to these converters. This gives
embedding parity against production checkpoints without executing pickled
code inside this framework.

Reference module layouts converted here:

* NlpClassifier        — ptm.* / emb_layer.ptm.* (shared BertModel),
  classifier.weight (ArcFace [out, in])              (nlp_classifier.py:14-15)
* NlpClassifierMultilabel — ptm.* + {firstcate,secondcate,tag}_classifier
  .weight                              (nlp_classifier_multilabel.py:15-17)
* NlpSentenceTransformer  — ptm.* + classifier.{weight,bias} (Linear 3H->2)
                                       (nlp_sentence_transformer.py:17)
* CvClassifier         — backbone.* (timm EfficientNet), fc./bn. neck,
  classifier.weight                                  (cv_classifier.py:23-38)
* MultimodalClassifier — cv.* + nlp.* submodules + classifier.weight
                                       (multimodal_classifier.py:16-22)
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from multimodalsimilar_tpu.models.bert import BertConfig
from multimodalsimilar_tpu.models.efficientnet import EfficientNetConfig
from multimodalsimilar_tpu.models.hf_import import (
    _np, bert_params_from_torch, efficientnet_params_from_timm)


def _strip(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: _np(v) for k, v in sd.items()
            if k.startswith(prefix)}


def _unwrap_dataparallel(sd: Mapping) -> Mapping:
    """Strip nn.DataParallel's 'module.' key prefix.

    The reference's v2_dist/v3_dist jobs save DataParallel-wrapped modules
    (nlp_classifier_train_daodian_v2_dist.py:82-86) and their consumers unwrap
    with ``.module`` (goodssku_emb.py:174-177); state_dicts taken from the
    wrapper carry 'module.'-prefixed keys. Accept both layouts everywhere.
    """
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _bert_subtree(sd: Mapping, config: BertConfig) -> Dict:
    """Pull the BertModel out of a reference text model; prefers the 'ptm.'
    alias (identical tensors also appear under 'emb_layer.ptm.')."""
    bert_sd = _strip(sd, "ptm.")
    if not bert_sd:
        bert_sd = _strip(sd, "emb_layer.ptm.")
    return bert_params_from_torch(bert_sd, config)


def nlp_classifier_from_reference(sd: Mapping, config: BertConfig) -> Dict:
    """-> params for models.classifiers.NlpTextClassifier."""
    sd = _unwrap_dataparallel(sd)
    return {
        "tower": {"encoder": _bert_subtree(sd, config)},
        "head": {"weight": _np(sd["classifier.weight"])},
    }


def multilabel_classifier_from_reference(sd: Mapping,
                                         config: BertConfig) -> Dict:
    sd = _unwrap_dataparallel(sd)
    return {
        "tower": {"encoder": _bert_subtree(sd, config)},
        "lv1_head": {"weight": _np(sd["firstcate_classifier.weight"])},
        "lv2_head": {"weight": _np(sd["secondcate_classifier.weight"])},
        "tag_head": {"weight": _np(sd["tag_classifier.weight"])},
    }


def siamese_from_reference(sd: Mapping, config: BertConfig) -> Dict:
    sd = _unwrap_dataparallel(sd)
    return {
        "tower": {"encoder": _bert_subtree(sd, config)},
        "classifier": {"kernel": _np(sd["classifier.weight"]).T,
                       "bias": _np(sd["classifier.bias"])},
    }


def cv_classifier_from_reference(sd: Mapping, config: EfficientNetConfig,
                                 use_fc: bool = True) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for models.vision.CvImageClassifier."""
    sd = _unwrap_dataparallel(sd)
    backbone_p, backbone_s = efficientnet_params_from_timm(
        _strip(sd, "backbone."), config)
    params: Dict = {"backbone": backbone_p,
                    "head": {"weight": _np(sd["classifier.weight"])}}
    stats: Dict = {"backbone": backbone_s}
    if use_fc:
        params["fc"] = {"kernel": _np(sd["fc.weight"]).T,
                        "bias": _np(sd["fc.bias"])}
        params["bn"] = {"scale": _np(sd["bn.weight"]),
                        "bias": _np(sd["bn.bias"])}
        stats["bn"] = {"mean": _np(sd["bn.running_mean"]),
                       "var": _np(sd["bn.running_var"])}
    return params, stats


def image_tower_from_reference(sd: Mapping, config: EfficientNetConfig,
                               use_bn: bool = False) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for models.vision.ImageTower.

    ImageEmb checkpoints (image_emb.py:14-32) hold the timm backbone under
    ``ptm.`` plus an always-present ``bn_layer`` (dead weights unless
    use_bn — image_emb.py:18).
    """
    sd = _unwrap_dataparallel(sd)
    backbone_p, backbone_s = efficientnet_params_from_timm(
        _strip(sd, "ptm."), config)
    params: Dict = {"backbone": backbone_p}
    stats: Dict = {"backbone": backbone_s}
    if use_bn:
        params["bn_layer"] = {"scale": _np(sd["bn_layer.weight"]),
                              "bias": _np(sd["bn_layer.bias"])}
        stats["bn_layer"] = {"mean": _np(sd["bn_layer.running_mean"]),
                             "var": _np(sd["bn_layer.running_var"])}
    return params, stats


def multimodal_from_reference(sd: Mapping, text_config: BertConfig,
                              image_config: EfficientNetConfig
                              ) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for models.multimodal.MultimodalClassifier."""
    sd = _unwrap_dataparallel(sd)
    cv_p, cv_s = cv_classifier_from_reference(_strip(sd, "cv."),
                                              image_config)
    nlp_p = nlp_classifier_from_reference(_strip(sd, "nlp."), text_config)
    params = {"cv": cv_p, "nlp": nlp_p,
              "head": {"weight": _np(sd["classifier.weight"])}}
    stats = {"cv": cv_s}
    return params, stats
