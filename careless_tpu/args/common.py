"""Common flags (reference careless/args/common.py)."""
name = None
description = None

args_and_kwargs = (
    (("--embed",), {
        "help": "Drop to an IPython shell at the end of optimization to "
                "inspect variables.",
        "action": "store_true",
        "default": False,
    }),
    (("--mc-samples",), {
        "help": "This is the number of samples to take per gradient step "
                "with default 1.",
        "type": int,
        "default": 1,
    }),
    (("--structure-factor-file",), {
        "help": "Initialize the structure factors from the output of a "
                "previous run (the *_structure_factor.npz file).",
        "type": str,
        "default": None,
    }),
    (("--freeze-structure-factors",), {
        "help": "Do not optimize the structure factors.",
        "action": "store_true",
    }),
    (("--structure-factor-init-scale",), {
        "help": "The width of the initial structure factor distribution is "
                "this times the standard deviation of the prior "
                "distribution. The default is 1.0.",
        "type": float,
        "default": 1.0,
    }),
    (("--epsilon",), {
        "help": "A small constant added to the scale parameters of "
                "variational distributions for numerical stability. "
                "The default is 1e-7.",
        "type": float,
        "default": 1e-7,
    }),
    (("--disable-metadata-standardization",), {
        "help": "By default careless-tpu will convert metadata to z-scores. "
                "This flag disables that behavior.",
        "action": "store_false",
        "dest": "standardize_metadata",
    }),
    (("--disable-progress-bar",), {
        "help": "Disable the progress bar.",
        "action": "store_true",
        "default": False,
    }),
    (("--save-data-manager",), {
        "help": "Optionally save the data manager object in pickle format.",
        "action": "store_true",
        "default": False,
    }),
)
