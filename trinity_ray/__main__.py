from trinity_ray.cli import main

raise SystemExit(main())
