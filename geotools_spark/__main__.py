from geotools_spark.cli import main

raise SystemExit(main())
