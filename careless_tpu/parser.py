"""Argument parser with parse-time environment side effects.

Reference behavior: /root/reference/careless/parser.py — an argparse tree
with mono/poly/devices subcommands built from the declarative flag groups;
parse_args applies process-global runtime settings (there: TF env vars/seed/
GPU visibility; here: JAX platform selection and device pinning).
"""
from __future__ import annotations

import argparse
import re
import textwrap
from os.path import exists


class EnvironmentSettingsMixin(argparse.ArgumentParser):
    """Applies JAX runtime settings when parse_args is called."""

    def parse_args(self, *args, **kwargs):
        parser = super().parse_args(*args, **kwargs)
        from os import environ

        if getattr(parser, "jax_debug", False):
            environ["TPU_STDERR_LOG_LEVEL"] = "0"
            environ["JAX_LOG_COMPILES"] = "1"
        if getattr(parser, "disable_gpu", False):
            platform = "cpu"
        else:
            platform = getattr(parser, "platform", None)
        if platform:
            environ["JAX_PLATFORMS"] = platform
            import jax
            jax.config.update("jax_platforms", platform)
        if getattr(parser, "run_eagerly", False):
            import jax
            jax.config.update("jax_disable_jit", True)
        if getattr(parser, "rng_impl", None):
            import jax
            jax.config.update("jax_default_prng_impl", parser.rng_impl)
        if getattr(parser, "device_id", 0):
            # pin single-device runs to the requested accelerator (the
            # reference's --gpu-id, /root/reference/careless/parser.py:26-40)
            import jax
            devices = jax.devices()
            if parser.device_id >= len(devices):
                self.error(
                    f"--device-id {parser.device_id} out of range: only "
                    f"{len(devices)} device(s) available")
            jax.config.update("jax_default_device", devices[parser.device_id])
        return parser


class CustomParser(EnvironmentSettingsMixin):
    def _validate_input_files(self, parser):
        if parser.type == "devices":
            return
        for in_fn in parser.reflection_files:
            if not exists(in_fn):
                self.error(f"Unmerged reflection file {in_fn} does not exist")
            elif in_fn.endswith(".mtz") or in_fn.endswith(".stream"):
                continue
            self.error(
                f"Could not determine filetype for reflection file, {in_fn}. "
                "Please make sure your files end in '.mtz' or '.stream' as "
                "appropriate.")

    def parse_args(self, *args, **kwargs):
        parser = super().parse_args(*args, **kwargs)
        self._validate_input_files(parser)
        return parser


class CustomFormatter(argparse.HelpFormatter):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._whitespace_matcher = re.compile("\n(?!\n)")

    def _fill_text(self, text, width, indent):
        text = re.sub(r"(?!>\n)\n(?!\n)", "", text)
        return textwrap.fill(text, width, initial_indent=indent,
                             subsequent_indent=indent,
                             replace_whitespace=False, drop_whitespace=False)


description = """
Scale and merge crystallographic data by approximate inference — TPU native.
"""

parser = CustomParser(description=description, formatter_class=CustomFormatter)

from . import __version__  # noqa: E402

parser.add_argument("--version", action="version",
                    version=f"careless-tpu {__version__}")

subs = parser.add_subparsers(title="Experiment Type", required=True, dest="type")
mono_sub = subs.add_parser("mono", help="Process monochromatic diffraction data.",
                           formatter_class=CustomFormatter)
poly_sub = subs.add_parser("poly", help="Process polychromatic, 'Laue', "
                                        "diffraction data.",
                           formatter_class=CustomFormatter)
devices_sub = subs.add_parser("devices", help="Print available devices",
                              formatter_class=CustomFormatter)

from .args import device_options, groups, poly, required  # noqa: E402


def _attach(sub, group):
    """Add one declarative flag group to a subparser, as its own --help
    section when the group is named."""
    if group.name is None:
        target = sub
    elif group.description is None:
        target = sub.add_argument_group(group.name)
    else:
        target = sub.add_argument_group(group.name, group.description)
    for flags, kwargs in group.args_and_kwargs:
        target.add_argument(*flags, **kwargs)


for sub in (mono_sub, poly_sub):
    for flags, kwargs in required.args_and_kwargs:
        sub.add_argument(*flags, **kwargs)
    if sub is poly_sub:
        for flags, kwargs in poly.args_and_kwargs:
            sub.add_argument(*flags, **kwargs)
    for group in groups:
        _attach(sub, group)

_attach(devices_sub, device_options)
