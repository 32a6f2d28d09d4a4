from openfoam_tpp_tpu.manager.cli import main

raise SystemExit(main())
