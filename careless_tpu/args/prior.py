"""Prior flags (reference careless/args/prior.py)."""
name = "Prior"
description = """
Options related to the prior distribution applied to the structure factors
during merging.
"""

args_and_kwargs = (
    (("--kl-weight",), {
        "help": "Set the weight of the kl divergence term relative to the "
                "likelihood. By default this is based purely on the number "
                "of reflections.",
        "type": float,
        "default": None,
    }),
    (("--wilson-prior-b",), {
        "help": "This flag enables learning reflections on a particular "
                "Wilson scale. By default, the Wilson prior is flat across "
                "resolution bins.",
        "type": float,
        "default": None,
    }),
    (("--double-wilson-r",), {
        "help": "For each input mtz, designate a prior correlation "
                "coefficient with its parent. Supply one float for each file "
                "separated by commas (zero for each root node). For example "
                "--double-wilson-r=0.,0.9.",
        "type": str,
        "default": None,
        "dest": "dwr",
    }),
    (("--double-wilson-parents",), {
        "help": "For each input mtz, designate a parent upon which its prior "
                "is conditioned. Supply one integer for each file separated "
                "by commas (None for root nodes). For example "
                "--double-wilson-parents=None,0.",
        "type": str,
        "default": None,
        "dest": "parents",
    }),
    (("--double-wilson-reindexing-ops",), {
        "help": "Semicolon-delimited reindexing operators to remap miller "
                "indices from the child ASU to the parent, e.g. "
                '--double-wilson-reindexing-ops="x,y,z;x-y,x,z+1/2".',
        "type": str,
        "default": None,
        "dest": "reindexing_ops",
    }),
    (("--optimize-double-wilson-r",), {
        "help": "Optimize the double-Wilson r values during training "
                "(sigmoid-constrained to (-1, 1)).",
        "action": "store_true",
        "default": False,
    }),
)
