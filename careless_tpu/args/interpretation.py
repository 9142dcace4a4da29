"""Data interpretation flags (reference careless/args/interpretation.py)."""
name = "Data Interpretation"
description = None

args_and_kwargs = (
    (("--spacegroups",), {
        "help": "The spacegroup(s) to use for merging: a single spacegroup "
                "applied to every input file, or a comma-separated list with "
                'one entry per file. For example --spacegroups="P 21 21 21" '
                'or --spacegroups="P 21 21 21,P 1 21 1".',
        "type": str,
        "default": None,
    }),
    (("--image-key",), {
        "help": "The name of the key indicating image number for each data "
                "set. If no key is given, the first key with the BATCH dtype "
                "is used.",
        "type": str,
        "default": None,
    }),
    (("--intensity-key",), {
        "help": "What key to use for reflection intensities. If no key is "
                "given, the first key with the intensity dtype is used.",
        "type": str,
        "default": None,
    }),
    (("--uncertainty-key",), {
        "help": "What key to use for reflection error estimates. If no key "
                "is given, a 'Sig'/'SIG'-prefixed match of the intensity key "
                "is tried, then the first key with the StdDev dtype.",
        "type": str,
        "default": None,
    }),
    (("--anomalous",), {
        "help": "If this flag is supplied, Friedel mates will be kept separate.",
        "action": "store_true",
        "default": False,
    }),
    (("--separate-files",), {
        "help": "Produce a separate output for each input mtz. In this mode, "
                "the data are scaled together and merged separately. The "
                "default is to merge all files into a single output.",
        "action": "store_true",
        "default": False,
    }),
)
