"""FlowFormer++ scope enforcement (reference ffpp_cfg_things.py knobs).

The port implements the default 'things' path only; a user porting a
non-default reference config (NATTEN / SK / quarter refinement / r_16 /
use_patch / ...) must get a NotImplementedError naming the knob, not a
silently wrong default-path forward. Same at the checkpoint level: a
state dict carrying optional-branch parameters is rejected by the
converter instead of having those weights silently dropped.
"""

import numpy as np
import pytest

from mfcnet_tpu.models.flowformerpp import (
    FlowFormerPP,
    ffpp_from_reference_config,
    validate_reference_config,
)


REJECTED = [
    ("vertical_encoder_attn", "NA"),        # NATTEN (NA.py:9-20)
    ("vertical_encoder_attn", "NA-twins"),
    ("gma", "GMA-SK"),                      # SK blocks (sk.py)
    ("gma", None),                          # no-GMA BasicUpdateBlock
    ("use_patch", True),                    # decoder.py:164,313
    ("r_16", 16),                           # encoder.py:407
    ("quater_refine", True),                # quater_upsampler.py:31-119
    ("pretrain_mode", True),
    ("use_rpe", True),
    ("flow_or_pe", "pe"),
    ("cross_attn", "rep"),
    ("pe", "exp"),
    ("patch_embed", "double"),
    ("use_convertor", True),
    ("detach_local", True),
    ("no_sc", True),
    ("cost_heads_num", 2),
    ("dropout", 0.1),
    ("droppath", 0.1),
    ("cost_encoder_res", False),            # encoder.py:286,325
]


@pytest.mark.parametrize("knob,val", REJECTED)
def test_validate_rejects_nondefault_branch(knob, val):
    with pytest.raises(NotImplementedError, match=knob):
        validate_reference_config({"percostformer3": {knob: val}})


def test_validate_accepts_things_defaults():
    # empty config == all defaults; flat and nested forms both accepted
    validate_reference_config({})
    validate_reference_config({"percostformer3": {
        "vertical_encoder_attn": "twins", "gma": "GMA",
        "use_patch": False, "r_16": -1, "quater_refine": False,
    }})
    validate_reference_config({"gma": "GMA", "r_16": 0})  # r_16<=0 = off


def test_validate_accepts_attr_style_config():
    class Inner:
        vertical_encoder_attn = "twins"
        gma = "GMA"

    class Cfg:
        percostformer3 = Inner()

    validate_reference_config(Cfg())

    class Bad(Inner):
        quater_refine = True

    class BadCfg:
        percostformer3 = Bad()

    with pytest.raises(NotImplementedError, match="quater_refine"):
        validate_reference_config(BadCfg())


def test_builder_maps_dimension_knobs():
    m = ffpp_from_reference_config({"percostformer3": {
        "decoder_depth": 4, "cost_latent_dim": 64,
        "cost_latent_token_num": 4, "query_latent_dim": 32,
        "vert_c_dim": 32, "encoder_depth": 2,
        "cost_latent_input_dim": 32,
    }})
    assert isinstance(m, FlowFormerPP)
    assert (m.iters, m.latent_dim, m.latent_tokens) == (4, 64, 4)
    assert (m.query_dim, m.vert_c_dim) == (32, 32)
    assert (m.perceiver_depth, m.cost_embed_dim) == (2, 32)


def test_builder_rejects_before_building():
    with pytest.raises(NotImplementedError, match="use_patch"):
        ffpp_from_reference_config(
            {"percostformer3": {"use_patch": True}}
        )


@pytest.mark.parametrize("key,what", [
    ("memory_encoder.vertical_encoder.rpb", "NATTEN"),
    ("memory_decoder.update_block.encoder.convc1.conv_list.0.weight",
     "SK update blocks"),
    ("memory_decoder.quater_upsampler.conv1.weight",
     "quarter refinement"),
])
def test_converter_rejects_optional_branch_checkpoints(key, what):
    from mfcnet_tpu.compat.torch_convert import convert_flowformerpp

    sd = {key: np.zeros((1,), np.float32)}
    with pytest.raises(NotImplementedError, match=what.split()[0]):
        convert_flowformerpp(sd)
