from petasearch_spark.cli import main

raise SystemExit(main())
