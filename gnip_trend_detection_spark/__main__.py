from gnip_trend_detection_spark.cli import main

raise SystemExit(main())
