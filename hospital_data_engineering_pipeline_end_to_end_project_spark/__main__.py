from hospital_data_engineering_pipeline_end_to_end_project_spark.cli import main

raise SystemExit(main())
