from hfsa_spark.cli import main

raise SystemExit(main())
