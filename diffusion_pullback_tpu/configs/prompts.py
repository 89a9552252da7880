"""Curated edit prompts for text-conditioned (SD) experiments.

Fills the role of /root/reference/src/configs/prompts.py: a small named bank
of known-good edit prompts for the weakly-supervised editing path (the
reference's published scripts use 'a photo of a sitting dog' / 'tiger' for
the with-prompt sweep, src/scripts/main_various_local_encoder_pullback_with_edit_prompt.sh).
"""

EDIT_PROMPTS = {
    "dog_sitting": "a photo of a sitting dog",
    "tiger": "a photo of a tiger",
    "smile": "a photo of a smiling face",
    "old": "a photo of an old person",
    "young": "a photo of a young person",
    "glasses": "a photo of a person wearing glasses",
    "church": "a photo of a church",
    "snow": "a photo in the snow",
}
