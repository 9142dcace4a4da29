"""Optimizer flags (reference careless/args/optimizer.py)."""
name = "Optimizer Parameters"
description = None

args_and_kwargs = (
    (("--iterations",), {
        "help": "Number of gradient steps to take.",
        "type": int,
        "default": 10000,
    }),
    (("--learning-rate",), {
        "help": "Adam learning rate. The default is 0.001",
        "type": float,
        "default": 0.001,
    }),
    (("--beta-1",), {
        "help": "Adam beta_1 param. The default is 0.9",
        "type": float,
        "default": 0.9,
    }),
    (("--beta-2",), {
        "help": "Adam beta_2 param. The default is 0.99",
        "type": float,
        "default": 0.99,
    }),
    (("--clipnorm",), {
        "help": "Optionally clip the norm of the gradient of each weight to "
                "be no larger than this value.",
        "type": float,
        "default": None,
    }),
    (("--clipvalue",), {
        "help": "Optionally clip the gradients to be no larger than this value.",
        "type": float,
        "default": None,
    }),
    (("--global-clipnorm",), {
        "help": "Optionally clip the norm of all the gradients to be no "
                "larger than this value.",
        "type": float,
        "default": None,
    }),
    (("--steps-per-compile",), {
        "help": "How many optimization steps to fuse into one compiled "
                "on-device loop (lax.scan chunk). Larger values reduce "
                "host-device round trips. The default is 100. With "
                "--test-fraction, the validation frequency is used instead.",
        "type": int,
        "default": 100,
    }),
)
