"""spark-submit application file for the engine CLI.

``spark-submit`` takes an application FILE as its primary resource —
there is no ``-m <module>`` flag — so cluster deployments launch the CLI
through this thin wrapper:

    python -m tools.make_pyfiles                       # build dist/ctre.zip
    spark-submit --master <cluster> --py-files dist/ctre.zip \\
        tools/ctre_submit.py predict --input ... --output ... --scorer stub

The package import resolves from the shipped zip (--py-files puts it on
the driver's and every executor Python worker's sys.path), and the CLI's
session factory defers to the submit-provided ``--master`` instead of
defaulting one in (session.py). End-to-end test:
tests/test_pyfiles_submit.py::test_spark_submit_cli_launcher.
"""

import sys

from clinicaltransformerrelationextraction_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
