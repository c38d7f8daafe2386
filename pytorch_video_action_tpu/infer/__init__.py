from .beam import beam_search_segments, eval_beam_search, run_beam_inference
from .ensemble import run_ensemble
from .loader import load_models, parse_model_type
from .predict import frame_predictions
from .scene import run_scene_aggregation
from .voting import (
    candidate_labels,
    majority_vote,
    model_segment_result,
    select_across_models,
    zero_avoided_vote,
)
