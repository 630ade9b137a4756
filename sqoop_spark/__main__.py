from sqoop_spark.cli import main

raise SystemExit(main())
