"""Reference CLI shim: ``python -m psi_tpu.cli.fitting_proxe <gen> <fit>``
(the reference's positional ``fitting_proxe.py gen_path fit_path``)."""

from psi_tpu.cli.fitting import main as _main


def main(argv=None):
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    _main([*argv[:2], "--dataset", "proxe", *argv[2:]])


if __name__ == "__main__":
    main()
