"""Required positional arguments (reference careless/args/required.py)."""
name = None
description = None

args_and_kwargs = (
    (("metadata_keys",), {
        "help": "Metadata keys for scaling. This is expected to be a comma "
                "delimited string. Careless always provides the special "
                "metadata keys 'dHKL,Hobs,Kobs,Lobs,image_id,file_id'. For "
                "stream files, careless provides the metadata keys "
                "'BATCH,s1x,s1y,s1z,ewald_offset,angular_ewald_offset'.",
        "type": str,
    }),
    (("reflection_files",), {
        "metavar": "reflections.{mtz,stream}",
        "help": "Mtz or stream file(s) containing unmerged reflection "
                "observations. If you are supplying stream files, you must "
                "also use the --spacegroups option to supply the symmetry "
                "for merging. careless-tpu poly does not support .stream files.",
        "type": str,
        "nargs": "+",
    }),
    (("output_base",), {
        "metavar": "out",
        "help": "Output filename base.",
        "type": str,
    }),
)
