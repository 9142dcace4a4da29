"""Scaling model flags (reference careless/args/scaling.py)."""
name = "Scaling Model"
description = """
Options related to the neural network scaling model used for merging.
"""

args_and_kwargs = (
    (("--scale-file",), {
        "help": "Initialize the scale model weights from the output of a "
                "previous run (the *_scale.npz file).",
        "type": str,
        "default": None,
    }),
    (("--freeze-scales",), {
        "help": "Do not optimize the scale model weights.",
        "action": "store_true",
    }),
    (("--mlp-layers",), {
        "help": "The number of dense neural network layers in the scaling "
                "model. The default is 20 layers.",
        "type": int,
        "default": 20,
    }),
    (("--mlp-width",), {
        "help": "The width of the hidden layers of the neural net. The "
                "default is the dimensionality of the metadata.",
        "type": int,
        "default": None,
    }),
    (("--image-layers",), {
        "help": "Add additional layers with local image-specific parameters.",
        "type": int,
        "default": 0,
    }),
    (("--disable-image-scales",), {
        "help": "Do not learn a local scale param for each image.",
        "action": "store_false",
        "dest": "use_image_scales",
        "default": True,
    }),
    (("--scale-bijector",), {
        "help": "What function to use to ensure positivity of the standard "
                "deviation of scales.",
        "type": str,
        "default": "exp",
        "choices": ["exp", "softplus"],
    }),
)
