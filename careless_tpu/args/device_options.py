"""Device/runtime flags — the JAX/TPU analogue of the reference's TensorFlow
options group (reference careless/args/tf_options.py).

The reference's flags concern single-GPU selection and tf.function modes;
here they map onto JAX platform selection, jit disabling, and multi-chip
sharding controls (SURVEY.md §5.8).
"""
name = "Device Options"
description = None

args_and_kwargs = (
    (("--run-eagerly",), {
        "help": "Disable jit compilation (jax.disable_jit). Mostly useful "
                "for debugging.",
        "action": "store_true",
        "default": False,
    }),
    (("--platform",), {
        "help": "Force a JAX platform, e.g. 'tpu' or 'cpu'. By default the "
                "best available platform is used.",
        "type": str,
        "default": None,
    }),
    (("--disable-gpu", "--disable-accelerator"), {
        "help": "Run on CPU only (compatibility alias of the reference's "
                "--disable-gpu; also disables TPU).",
        "action": "store_true",
        "default": False,
    }),
    (("--device-id", "--gpu-id"), {
        "help": "Index of the accelerator device to use for single-device "
                "runs. The default is 0.",
        "type": int,
        "default": 0,
        "dest": "device_id",
    }),
    (("--num-devices",), {
        "help": "Shard observations data-parallel over this many devices "
                "(a 1-D jax mesh over the local device set). The default of "
                "0 means single-device execution.",
        "type": int,
        "default": 0,
    }),
    (("--shard-axis",), {
        "help": "Which axis --num-devices shards. 'obs' (default) splits "
                "the observation axis (large datasets); 'mc' replicates "
                "the data and splits the Monte-Carlo sample axis "
                "(--mc-samples must be divisible by --num-devices; best for "
                "large-S variance-reduction runs on datasets that fit on "
                "one chip).",
        "type": str,
        "default": "obs",
        "choices": ["obs", "mc"],
    }),
    (("--fused-kernel",), {
        "help": "Use the fused Pallas likelihood kernel for the ELBO inner "
                "loop (Normal/Laplace/StudentT/Ev11 likelihood with an MLP "
                "or hybrid-image scaler). Since the trunk-head fold the "
                "plain XLA chain measures slightly faster on v5e, so "
                "'auto' (default) now selects the XLA path like 'off'; "
                "'on' forces the kernel (off-TPU it runs the slow "
                "interpreter, tests only).",
        "type": str,
        "default": "auto",
        "choices": ["auto", "on", "off"],
    }),
    (("--mlp-dtype",), {
        "help": "Matmul precision of the scaling-MLP trunk. 'float32' "
                "(default) matches the reference numerics; 'bfloat16' runs "
                "the trunk matmuls as bf16 MXU operands with float32 "
                "accumulation. Measured on TPU v5e: NO throughput "
                "difference (f32 matmuls already execute at the bf16 MXU "
                "rate; the trunk is issue-rate-bound, see "
                "benchmarks/PERF_NOTES.md) — kept for memory-bound wide "
                "trunks and cross-generation portability.",
        "type": str,
        "default": "float32",
        "choices": ["float32", "bfloat16"],
    }),
    (("--rng-impl",), {
        "help": "JAX PRNG implementation. 'threefry2x32' (default) is "
                "deterministic across backends; 'rbg' uses the TPU hardware "
                "RNG and is substantially faster for the per-step MC "
                "sampling.",
        "type": str,
        "default": None,
        "choices": ["threefry2x32", "rbg", "unsafe_rbg"],
    }),
    (("--profile-dir",), {
        "help": "Capture a jax.profiler trace of the training loop into "
                "this directory (view with TensorBoard / xprof).",
        "type": str,
        "default": None,
    }),
    (("--jax-debug",), {
        "help": "Increase runtime log verbosity.",
        "action": "store_true",
        "default": False,
    }),
    (("--seed",), {
        "help": "Random number seed for consistent sampling.",
        "type": int,
        "default": 1234,
    }),
)
