"""spark-submit launcher for the flagship stage.

The package rides in --py-files (built by tools/package_pyfiles.py); this
file is the plain script spark-submit needs (it cannot run `-m module`):

    spark-submit --master <cluster> \
        --py-files dist/pii_detection_service_spark.zip \
        tools/submit_stage.py \
        --source /path/to/images_table --out /path/to/out \
        --buckets 4096 --salt 16
"""

from pii_detection_service_spark.cli import main

if __name__ == "__main__":
    main()
