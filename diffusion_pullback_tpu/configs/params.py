"""Per-timestep edit-strength tables.

Value-parity with the reference's published experiment grid
(/root/reference/src/configs/params.py:1-43), keyed by
{model family} × h_t (the fraction-of-T at which h is tapped). These are the
empirically-tuned knobs behind `preset()`'s derived x_space_guidance_scale
(reference define_argparser.py:200-204).
"""

X_SPACE_GUIDANCE_SCALE_DICT = {
    "stable-diffusion": {
        1.0: 0.5, 0.9: 0.5, 0.8: 1, 0.7: 1, 0.6: 2,
        0.5: 2, 0.4: 2, 0.3: 2, 0.2: 2, 0.1: 2, 0.0: 0,
    },
    "uncond": {1.0: 0.5, 0.8: 1, 0.6: 4, 0.4: 16, 0.2: 16},
}

X_SPACE_EDIT_STEP_SIZE_DICT = {
    "stable-diffusion": {
        1.0: 0.5, 0.9: 0.5, 0.8: 1, 0.7: 1, 0.6: 2,
        0.5: 2, 0.4: 2, 0.3: 2, 0.2: 2, 0.1: 2, 0.0: 0,
    },
    "uncond": {1.0: 0.5, 0.8: 1, 0.6: 4, 0.4: 16, 0.2: 16},
}
